from etfconstituentextractor_spark.functions.boundary import (
    parse_money,
    parse_pct,
    parse_date,
    strip_dashes,
)
from etfconstituentextractor_spark.functions.parity import (
    dec,
    dec_rate,
    dsum,
    davg,
    round_dbl,
)

__all__ = [
    "parse_money",
    "parse_pct",
    "parse_date",
    "strip_dashes",
    "dec",
    "dec_rate",
    "dsum",
    "davg",
    "round_dbl",
]
