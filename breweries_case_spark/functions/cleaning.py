"""String-cleaning expressions reproducing the reference's silver layer
normalization (reference ``src/processors/breweries_silver_processors.py:52-64``,
SURVEY §2.7 C1-C4)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_text(col: Column, case: str | None = None) -> Column:
    """``trim`` plus optional case normalization.

    case="lower" → brewery_type semantics; case="upper" → state/country
    semantics; None → id/name/city/postal_code/website_url semantics.
    """
    if case not in (None, "lower", "upper"):
        # a typo'd case must fail loudly, not silently skip normalization
        raise ValueError(f"case must be None, 'lower', or 'upper'; got {case!r}")
    out = F.trim(col)
    if case == "lower":
        out = F.lower(out)
    elif case == "upper":
        out = F.upper(out)
    return out


def digits_only(col: Column) -> Column:
    """Keep digits only — phone normalization
    (reference ``breweries_silver_processors.py:62``: regexp_replace [^\\d])."""
    return F.regexp_replace(col, r"[^\d]", "")
