"""Post-optimal analysis tools (sensitivity ranging)."""

from relp_tpu.analysis.ranging import RangingResult, ranging  # noqa: F401
