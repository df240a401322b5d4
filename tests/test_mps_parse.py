"""MPS parser tests.

Fixture TESTPROB is the classic example from the public MPS format
documentation (also used by the reference's parser tests); expectations are
derived from the format specification.
"""

import pytest

import relp_tpu  # noqa: F401
from relp_tpu.io.errors import InconsistencyError, ParseError
from relp_tpu.io.mps_convert import mps_to_general_form
from relp_tpu.io.mps_model import BoundType
from relp_tpu.io.mps_parse import parse_fixed, parse_free
from relp_tpu.model.elements import ConstraintRelation, Objective

TESTPROB = """
* Comment line
NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    XONE      COST                 1   LIM1                 1
    XONE      LIM2                 1
    MARKER0   'MARKER'      'INTORG'
    YTWO      COST                 4   LIM1                 1
    YTWO      MYEQN               -1
    MARKER0   'MARKER'      'INTEND'
    ZTHREE    COST                 9   LIM2                 1
    ZTHREE    MYEQN                1
RHS
    RHS1      LIM1                 5   LIM2                10
    RHS1      MYEQN                7
BOUNDS
 UP BND1      XONE                 4
 LO BND1      YTWO                -1
 UP BND1      YTWO                 1
ENDATA
"""


def test_parse_free_sections():
    mps = parse_free(TESTPROB)
    assert mps.name == "TESTPROB"
    assert mps.objective is Objective.MINIMIZE
    assert mps.cost_row_name == "COST"
    assert [r.name for r in mps.rows] == ["LIM1", "LIM2", "MYEQN"]
    assert [r.constraint_type for r in mps.rows] == [
        ConstraintRelation.LESS,
        ConstraintRelation.GREATER,
        ConstraintRelation.EQUAL,
    ]
    assert [c.name for c in mps.columns] == ["XONE", "YTWO", "ZTHREE"]
    # YTWO is between INTORG/INTEND markers
    from relp_tpu.model.elements import VariableType

    assert mps.columns[0].variable_type is VariableType.CONTINUOUS
    assert mps.columns[1].variable_type is VariableType.INTEGER
    assert mps.columns[2].variable_type is VariableType.CONTINUOUS
    assert mps.cost_values == [(0, 1.0), (1, 4.0), (2, 9.0)]
    assert mps.columns[0].values == [(0, 1.0), (1, 1.0)]
    assert mps.rhss[0].values == [(0, 5.0), (1, 10.0), (2, 7.0)]
    assert mps.bounds[0].values == [
        (0, BoundType.UPPER_CONTINUOUS, 4.0),
        (1, BoundType.LOWER_CONTINUOUS, -1.0),
        (1, BoundType.UPPER_CONTINUOUS, 1.0),
    ]


def test_convert_general_form():
    gf = mps_to_general_form(parse_free(TESTPROB))
    assert gf.nr_constraints == 3
    assert gf.nr_variables == 3
    # GLPK default-lower-bound rules: XONE has UP only => lower defaults to 0
    x, y, z = gf.variables
    assert (x.lower, x.upper) == (0.0, 4.0)
    assert (y.lower, y.upper) == (-1.0, 1.0)
    # ZTHREE untouched by bounds: default [0, inf)
    assert z.lower == 0.0 and z.upper == float("inf")
    assert list(gf.b) == [5.0, 10.0, 7.0]
    assert gf.A.toarray().tolist() == [
        [1.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.0, -1.0, 1.0],
    ]


def test_second_n_row_is_ignored_free_row():
    # GLPK-compatible superset: extra N rows are ignored free rows (the
    # reference rejects a second cost row, parse/mod.rs:265-270)
    text = TESTPROB.replace(" G  LIM2", " N  LIM2")
    mps = parse_free(text)
    assert [r.name for r in mps.rows] == ["LIM1", "MYEQN"]
    # XONE's LIM2 coefficient (now on a free row) is dropped
    assert mps.columns[0].values == [(0, 1.0)]


def test_unknown_row_rejected():
    bad = TESTPROB.replace("    XONE      LIM2", "    XONE      NOPE")
    with pytest.raises(InconsistencyError):
        parse_free(bad)


def test_objsense_max():
    text = TESTPROB.replace("ROWS", "OBJSENSE\n    MAX\nROWS", 1)
    assert parse_free(text).objective is Objective.MAXIMIZE


def test_fixed_format_with_spaces_in_names():
    # SIF fixed columns: name fields are character ranges [4..12], [14..22],
    # [24..36]; interior spaces survive.
    # field windows: [4..12] name1, [14..22] name2, [24..36] value1,
    # [39..47] name3, [49..61] value2
    text = (
        "NAME          SPACY\n"
        "ROWS\n"
        " N  COST\n"
        " L  ROW ONE \n"
        "COLUMNS\n"
        "    X 1       COST      2.0            ROW ONE   1.0\n"
        "RHS\n"
        "    RHS       ROW ONE   5.0\n"
        "ENDATA\n"
    )
    mps = parse_fixed(text)
    assert [r.name for r in mps.rows] == ["ROW ONE"]
    assert [c.name for c in mps.columns] == ["X 1"]
    assert mps.cost_values == [(0, 2.0)]
    assert mps.rhss[0].values == [(0, 5.0)]


def test_ranges_semantics():
    # RANGES on G row: interval [b, b + |r|]; stored b = upper end
    text = (
        "NAME R\n"
        "ROWS\n"
        " N  C\n"
        " G  RG\n"
        " L  RL\n"
        " E  REP\n"
        " E  REN\n"
        "COLUMNS\n"
        "    X  C  1.0  RG  1.0\n"
        "    X  RL  1.0  REP  1.0\n"
        "    X  REN  1.0\n"
        "RHS\n"
        "    R  RG  4.0  RL  4.0\n"
        "    R  REP  4.0  REN  4.0\n"
        "RANGES\n"
        "    S  RG  2.0  RL  2.0\n"
        "    S  REP  2.0  REN  -2.0\n"
        "ENDATA\n"
    )
    gf = mps_to_general_form(parse_free(text))
    # all rows become ranges with width 2
    assert [ct.range_width for ct in gf.constraint_types] == [2.0, 2.0, 2.0, 2.0]
    # upper ends per the reference table (io/mps/mod.rs:238-245)
    assert list(gf.b) == [6.0, 4.0, 6.0, 4.0]


def test_duplicate_range_rejected():
    text = (
        "NAME R\nROWS\n N  C\n G  RG\nCOLUMNS\n    X  C  1.0  RG  1.0\n"
        "RHS\n    R  RG  4.0\nRANGES\n    S  RG  2.0\n    S  RG  3.0\nENDATA\n"
    )
    with pytest.raises(InconsistencyError):
        mps_to_general_form(parse_free(text))


def test_free_and_bounded_rejected():
    bad = TESTPROB.replace(
        " UP BND1      XONE                 4",
        " UP BND1      XONE                 4\n FR BND1      XONE",
    )
    with pytest.raises(InconsistencyError):
        mps_to_general_form(parse_free(bad))


def test_mi_bound_standard_semantics():
    # MI sets lower = -inf only (GLPK-standard; deliberate deviation from
    # the reference, whose MI also implies an upper bound of 0 and thereby
    # makes (-inf, u] inexpressible)
    text = TESTPROB.replace(
        " LO BND1      YTWO                -1", " MI BND1      YTWO"
    )
    gf = mps_to_general_form(parse_free(text))
    y = gf.variables[1]
    assert y.lower == float("-inf")
    assert y.upper == 1.0  # the UP bound survives


def test_rhs_on_cost_row_is_objective_constant():
    text = TESTPROB.replace(
        "    RHS1      MYEQN                7",
        "    RHS1      MYEQN                7\n    RHS1      COST                 3",
    )
    mps = parse_free(text)
    assert mps.objective_constant == -3.0


def test_dexponent_numbers():
    from relp_tpu.io.numbers import parse_float

    assert parse_float("1.5D+02") == 150.0
    assert parse_float("-2.5d-1") == -0.25
    assert parse_float("  3.25  ") == 3.25
