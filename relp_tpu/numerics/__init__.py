"""Numerics: dtype policy and the CPU-side exact verifier.

Counterpart of the reference's number-type layer (``src/data/number_types/``,
SURVEY §2.1).  The device solver replaces exact rationals with float64 +
tolerances; this package keeps the *exact* capability as a host-side
verification tool built on ``fractions.Fraction`` — the plan stated in
SURVEY §2.1 ("keep an optional CPU-side exact verifier for tests").
"""

from relp_tpu.numerics.exact import ExactVerifier, verify_against_file

__all__ = ["ExactVerifier", "verify_against_file"]
