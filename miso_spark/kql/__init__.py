"""KQL front-end: text → miso_spark.plan.Plan.

Parity: miso-kql/src/{lexer,parser}.rs (grammar surface documented in
SURVEY.md §2.1/§2.2). Implemented as a hand-written Python lexer +
recursive-descent parser — no code derived from the reference's
chumsky/logos implementation.
"""

from miso_spark.kql.parser import parse_kql

__all__ = ["parse_kql"]
