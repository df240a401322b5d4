"""Collect the round-5 bench payload lines from runs/ logs into the
BENCH_r05*.json artifacts the judge reads."""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

OUT = {
    "netlib_full_wall_s": "BENCH_r05.json",
    "netlib_large_wall_s": "BENCH_r05_large.json",
    "netlib_xl_wall_s": "XL_r05.json",
    "fleet_lps_per_s": "BENCH_r05_fleet.json",
}

paylines = {}
for log in sys.argv[1:]:
    for line in open(log, errors="replace"):
        m = re.search(r'(\{"metric": "[^"]+".*\})\s*$', line)
        if not m:
            continue
        try:
            d = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        metric = d.get("metric")
        if metric in OUT:
            paylines[metric] = d  # keep the LAST payload per metric

for metric, d in paylines.items():
    with open(OUT[metric], "w") as f:
        json.dump(d, f, indent=1)
    print(f"{OUT[metric]}: {metric} value={d.get('value')} "
          f"vs_highs={d.get('vs_highs_wall')}")
