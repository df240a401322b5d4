// Fast MPS/SIF scanner.
//
// Native counterpart of the Python parser in relp_tpu/io/mps_parse.py and of
// the reference's native-Rust parser (src/io/mps/parse/mod.rs).  Implements
// the same semantics: free format (whitespace fields) and fixed format
// (character windows [0,1)[1,3)[4,12)[14,22)[24,36)[39,47)[49,61)), sections
// NAME/OBJSENSE/ROWS/COLUMNS(+INTORG/INTEND)/RHS/RANGES/BOUNDS/ENDATA,
// RHS-on-cost-row as objective constant, even-token RHS/RANGES heuristic.
// Exposed through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Differentially tested against the Python parser over the full problem
// corpora (tests/test_native_parser.py).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {          // matrix / cost / rhs / ranges numeric record
  int32_t col;          // column index (or -1)
  int32_t row;          // row index (or -1)
  double value;
};

struct BoundRec {
  int32_t col;
  char type[3];         // "LO", "UP", ...
  double value;
  uint8_t has_value;
  int32_t group;        // bound set index
};

struct GroupRec {       // rhs/range value with its set id
  int32_t group;
  int32_t row;
  double value;
};

struct Problem {
  std::string error;
  std::string name;
  int objsense = 0;     // 0 = min, 1 = max
  double obj_constant = 0.0;

  std::vector<std::string> row_names;
  std::string row_types;                 // 'L','E','G' per row
  std::vector<std::string> col_names;
  std::vector<uint8_t> col_is_int;

  std::vector<Entry> entries;            // constraint matrix triplets
  std::vector<Entry> cost;               // (col, -1, value)
  std::vector<GroupRec> rhs;
  std::vector<std::string> rhs_groups;
  std::vector<GroupRec> ranges;
  std::vector<std::string> range_groups;
  std::vector<BoundRec> bounds;
  std::vector<std::string> bound_groups;
};

bool parse_double(const std::string& s, double* out) {
  std::string t = s;
  for (auto& ch : t)
    if (ch == 'D' || ch == 'd') ch = 'e';
  char* end = nullptr;
  *out = strtod(t.c_str(), &end);
  return end && *end == '\0' && end != t.c_str();
}

void split_free(const char* line, size_t len, std::vector<std::string>* out) {
  out->clear();
  size_t i = 0;
  while (i < len) {
    while (i < len && isspace((unsigned char)line[i])) i++;
    size_t start = i;
    while (i < len && !isspace((unsigned char)line[i])) i++;
    if (i > start) out->emplace_back(line + start, i - start);
  }
}

const int kFixed[7][2] = {{0, 1}, {1, 3}, {4, 12}, {14, 22}, {24, 36}, {39, 47}, {49, 61}};

void split_fixed(const char* line, size_t len, std::vector<std::string>* out) {
  out->clear();
  for (auto& f : kFixed) {
    int start = f[0], end = f[1];
    if ((size_t)start >= len) break;
    int stop = end < (int)len ? end : (int)len;
    // trim
    int a = start, b = stop;
    while (a < b && isspace((unsigned char)line[a])) a++;
    while (b > a && isspace((unsigned char)line[b - 1])) b--;
    if (b > a) out->emplace_back(line + a, b - a);
  }
}

bool bound_takes_value(const std::string& t) {
  return t == "LO" || t == "UP" || t == "FX" || t == "LI" || t == "UI" || t == "SC";
}

struct Parser {
  Problem* p;
  bool fixed;
  std::unordered_map<std::string, int32_t> row_index;
  std::unordered_map<std::string, int32_t> col_index;
  std::string cost_row;
  bool have_cost_row = false;
  // extra N rows: ignored free rows (GLPK-compatible superset)
  std::unordered_map<std::string, char> free_rows;

  void fields(const char* line, size_t len, std::vector<std::string>* out) {
    if (fixed)
      split_fixed(line, len, out);
    else
      split_free(line, len, out);
  }

  bool fail(int lineno, const std::string& msg) {
    char buf[64];
    snprintf(buf, sizeof(buf), " (line %d)", lineno);
    p->error = msg + buf;
    return false;
  }

  bool run(FILE* f) {
    enum Sec { PRE, ROWS, COLS, RHS, RANGES, BOUNDS, DONE } sec = PRE;
    char buf[4096];
    int lineno = 0;
    std::vector<std::string> fs;
    int active_int = 0;
    int32_t cur_col = -1;
    std::string cur_col_name;
    int pending_objsense = 0;

    while (fgets(buf, sizeof(buf), f)) {
      lineno++;
      size_t len = strlen(buf);
      while (len && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) len--;
      // skip blank / comment
      size_t ws = 0;
      while (ws < len && isspace((unsigned char)buf[ws])) ws++;
      // '&' in column 1 is a SIF comment-continuation line (Kennington files)
      if (ws == len || buf[ws] == '*' || buf[0] == '&') continue;

      bool header = !isspace((unsigned char)buf[0]);
      if (header) {
        std::vector<std::string> toks;
        split_free(buf, len, &toks);
        std::string head = toks[0];
        for (auto& c : head) c = toupper((unsigned char)c);
        if (pending_objsense) return fail(lineno, "OBJSENSE direction missing");
        if (head == "NAME") {
          if (toks.size() > 1) {
            // name may contain spaces in fixed format: take the rest, trimmed
            const char* rest = buf;
            size_t pos = 4;
            while (pos < len && isspace((unsigned char)rest[pos])) pos++;
            size_t endp = len;
            while (endp > pos && isspace((unsigned char)rest[endp - 1])) endp--;
            p->name.assign(rest + pos, endp - pos);
          }
          continue;
        }
        if (head == "OBJSENSE") {
          if (toks.size() > 1) {
            std::string d = toks[1];
            for (auto& c : d) c = toupper((unsigned char)c);
            p->objsense = d.rfind("MAX", 0) == 0 ? 1 : 0;
          } else {
            pending_objsense = 1;
          }
          continue;
        }
        if (head == "ROWS") { sec = ROWS; continue; }
        if (head == "COLUMNS") { sec = COLS; continue; }
        if (head == "RHS") { sec = RHS; continue; }
        if (head == "RANGES") { sec = RANGES; continue; }
        if (head == "BOUNDS") { sec = BOUNDS; continue; }
        if (head == "ENDATA") { sec = DONE; break; }
        if (head == "OBJECT") { sec = DONE; break; }  // SIF "OBJECT BOUND" trailer
        return fail(lineno, "Unknown section header " + head);
      }

      if (pending_objsense) {
        std::vector<std::string> toks;
        split_free(buf, len, &toks);
        std::string d = toks.empty() ? "" : toks[0];
        for (auto& c : d) c = toupper((unsigned char)c);
        if (d.rfind("MAX", 0) == 0) p->objsense = 1;
        else if (d.rfind("MIN", 0) == 0) p->objsense = 0;
        else return fail(lineno, "Unknown OBJSENSE");
        pending_objsense = 0;
        continue;
      }

      switch (sec) {
        case ROWS: {
          fields(buf, len, &fs);
          if (fs.size() < 2) return fail(lineno, "ROWS line needs type and name");
          char t = toupper((unsigned char)fs[0][0]);
          if (t == 'N') {
            if (!have_cost_row) {
              cost_row = fs[1];
              have_cost_row = true;
            } else {
              free_rows[fs[1]] = 1;
            }
          } else if (t == 'L' || t == 'E' || t == 'G') {
            if (row_index.count(fs[1]) || (have_cost_row && fs[1] == cost_row))
              return fail(lineno, "Duplicate row name " + fs[1]);
            row_index[fs[1]] = (int32_t)p->row_names.size();
            p->row_names.push_back(fs[1]);
            p->row_types.push_back(t);
          } else {
            return fail(lineno, "Row type unknown");
          }
          break;
        }
        case COLS: {
          fields(buf, len, &fs);
          bool marker = false;
          for (auto& s : fs)
            if (s == "'MARKER'") marker = true;
          if (marker) {
            bool found = false;
            for (auto& s : fs) {
              if (s == "'INTORG'") { active_int = 1; found = true; }
              if (s == "'INTEND'") { active_int = 0; found = true; }
            }
            if (!found) return fail(lineno, "Unknown MARKER kind");
            break;
          }
          if (fs.size() < 3 || fs.size() % 2 == 0)
            return fail(lineno, "Malformed COLUMNS line");
          const std::string& cname = fs[0];
          if (cname != cur_col_name) {
            auto it = col_index.find(cname);
            if (it != col_index.end()) {
              cur_col = it->second;
            } else {
              cur_col = (int32_t)p->col_names.size();
              col_index[cname] = cur_col;
              p->col_names.push_back(cname);
              p->col_is_int.push_back((uint8_t)active_int);
            }
            cur_col_name = cname;
          }
          for (size_t k = 1; k + 1 < fs.size(); k += 2) {
            double v;
            if (!parse_double(fs[k + 1], &v))
              return fail(lineno, "Bad number " + fs[k + 1]);
            if (have_cost_row && fs[k] == cost_row) {
              p->cost.push_back({cur_col, -1, v});
            } else {
              auto it = row_index.find(fs[k]);
              if (it == row_index.end()) {
                if (free_rows.count(fs[k])) continue;  // ignored free row
                return fail(lineno, "Row \"" + fs[k] + "\" not known");
              }
              p->entries.push_back({cur_col, it->second, v});
            }
          }
          break;
        }
        case RHS:
        case RANGES: {
          fields(buf, len, &fs);
          std::string group;
          size_t first;
          if (fs.size() % 2 == 0) {  // no set-name field
            group = "";
            first = 0;
          } else {
            group = fs[0];
            first = 1;
          }
          if (fs.size() - first < 2) return fail(lineno, "Malformed RHS/RANGES line");
          auto* groups = sec == RHS ? &p->rhs_groups : &p->range_groups;
          auto* recs = sec == RHS ? &p->rhs : &p->ranges;
          if (groups->empty() || groups->back() != group) groups->push_back(group);
          int32_t gid = (int32_t)groups->size() - 1;
          for (size_t k = first; k + 1 < fs.size(); k += 2) {
            double v;
            if (!parse_double(fs[k + 1], &v))
              return fail(lineno, "Bad number " + fs[k + 1]);
            auto it = row_index.find(fs[k]);
            if (it == row_index.end()) {
              if (sec == RHS && have_cost_row && fs[k] == cost_row) {
                p->obj_constant = -v;
                continue;
              }
              if (free_rows.count(fs[k])) continue;  // ignored free row
              return fail(lineno, "Row \"" + fs[k] + "\" not known");
            }
            recs->push_back({gid, it->second, v});
          }
          break;
        }
        case BOUNDS: {
          fields(buf, len, &fs);
          if (fs.size() < 3) return fail(lineno, "Malformed BOUNDS line");
          std::string t = fs[0];
          for (auto& c : t) c = toupper((unsigned char)c);
          if (t.size() != 2) return fail(lineno, "Bound type unknown");
          std::string group, col;
          double value = 0.0;
          uint8_t has_value = 0;
          if (bound_takes_value(t)) {
            if (fs.size() >= 4) {
              group = fs[1]; col = fs[2];
              if (!parse_double(fs[3], &value)) return fail(lineno, "Bad number " + fs[3]);
            } else {
              group = ""; col = fs[1];
              if (!parse_double(fs[2], &value)) return fail(lineno, "Bad number " + fs[2]);
            }
            has_value = 1;
          } else if (t == "FR" || t == "MI" || t == "PL" || t == "BV") {
            group = fs[1]; col = fs[2];
            if (!col_index.count(col) && col_index.count(group)) {
              col = group;
              group = "";
            }
          } else {
            return fail(lineno, "Bound type " + t + " unknown");
          }
          auto it = col_index.find(col);
          if (it == col_index.end())
            return fail(lineno, "Column \"" + col + "\" not known");
          if (p->bound_groups.empty() || p->bound_groups.back() != group)
            p->bound_groups.push_back(group);
          BoundRec rec;
          rec.col = it->second;
          rec.type[0] = t[0]; rec.type[1] = t[1]; rec.type[2] = 0;
          rec.value = value;
          rec.has_value = has_value;
          rec.group = (int32_t)p->bound_groups.size() - 1;
          p->bounds.push_back(rec);
          break;
        }
        default:
          return fail(lineno, "Data line outside any section");
      }
    }
    if (!have_cost_row) {
      p->error = "No cost row read.";
      return false;
    }
    return true;
  }
};

}  // namespace

extern "C" {

Problem* mps_scan(const char* path, int fixed_format) {
  auto* p = new Problem();
  FILE* f = fopen(path, "rb");
  if (!f) {
    p->error = std::string("cannot open ") + path;
    return p;
  }
  Parser parser{p, fixed_format != 0};
  parser.run(f);
  fclose(f);
  return p;
}

void mps_free(Problem* p) { delete p; }

const char* mps_error(Problem* p) { return p->error.empty() ? nullptr : p->error.c_str(); }
const char* mps_problem_name(Problem* p) { return p->name.c_str(); }
int mps_objsense(Problem* p) { return p->objsense; }
double mps_obj_constant(Problem* p) { return p->obj_constant; }

int mps_nr_rows(Problem* p) { return (int)p->row_names.size(); }
int mps_nr_cols(Problem* p) { return (int)p->col_names.size(); }
const char* mps_row_name(Problem* p, int i) { return p->row_names[i].c_str(); }
char mps_row_type(Problem* p, int i) { return p->row_types[i]; }
const char* mps_col_name(Problem* p, int j) { return p->col_names[j].c_str(); }
int mps_col_is_int(Problem* p, int j) { return p->col_is_int[j]; }

int64_t mps_nr_entries(Problem* p) { return (int64_t)p->entries.size(); }
void mps_get_entries(Problem* p, int32_t* col, int32_t* row, double* val) {
  for (size_t k = 0; k < p->entries.size(); k++) {
    col[k] = p->entries[k].col;
    row[k] = p->entries[k].row;
    val[k] = p->entries[k].value;
  }
}

int64_t mps_nr_cost(Problem* p) { return (int64_t)p->cost.size(); }
void mps_get_cost(Problem* p, int32_t* col, double* val) {
  for (size_t k = 0; k < p->cost.size(); k++) {
    col[k] = p->cost[k].col;
    val[k] = p->cost[k].value;
  }
}

int64_t mps_nr_rhs(Problem* p) { return (int64_t)p->rhs.size(); }
void mps_get_rhs(Problem* p, int32_t* group, int32_t* row, double* val) {
  for (size_t k = 0; k < p->rhs.size(); k++) {
    group[k] = p->rhs[k].group;
    row[k] = p->rhs[k].row;
    val[k] = p->rhs[k].value;
  }
}
int mps_nr_rhs_groups(Problem* p) { return (int)p->rhs_groups.size(); }
const char* mps_rhs_group_name(Problem* p, int g) { return p->rhs_groups[g].c_str(); }

int64_t mps_nr_ranges(Problem* p) { return (int64_t)p->ranges.size(); }
void mps_get_ranges(Problem* p, int32_t* group, int32_t* row, double* val) {
  for (size_t k = 0; k < p->ranges.size(); k++) {
    group[k] = p->ranges[k].group;
    row[k] = p->ranges[k].row;
    val[k] = p->ranges[k].value;
  }
}
int mps_nr_range_groups(Problem* p) { return (int)p->range_groups.size(); }
const char* mps_range_group_name(Problem* p, int g) { return p->range_groups[g].c_str(); }

int64_t mps_nr_bounds(Problem* p) { return (int64_t)p->bounds.size(); }
void mps_get_bounds(Problem* p, int32_t* col, char* types2, double* val,
                    uint8_t* has_val, int32_t* group) {
  for (size_t k = 0; k < p->bounds.size(); k++) {
    col[k] = p->bounds[k].col;
    types2[2 * k] = p->bounds[k].type[0];
    types2[2 * k + 1] = p->bounds[k].type[1];
    val[k] = p->bounds[k].value;
    has_val[k] = p->bounds[k].has_value;
    group[k] = p->bounds[k].group;
  }
}
int mps_nr_bound_groups(Problem* p) { return (int)p->bound_groups.size(); }
const char* mps_bound_group_name(Problem* p, int g) { return p->bound_groups[g].c_str(); }

}  // extern "C"
