"""Pandas UDF definitions for the query catalog.

Kept in a module WITHOUT ``from __future__ import annotations``:
PySpark's pandas_udf resolves the type hints at definition time, and
PEP 563 stringized annotations break its signature inference.
"""

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("long")
def s2_cell_l10(lat: pd.Series, lon: pd.Series) -> pd.Series:
    from ..functions.s2 import s2_cell_id

    return pd.Series(s2_cell_id(lat.to_numpy(), lon.to_numpy(), level=10))


def hex_cell_udf(res):
    @F.pandas_udf("long")
    def cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        from ..functions.hexgrid import hex_cell

        return pd.Series(hex_cell(lat.to_numpy(), lon.to_numpy(), res))

    return cell


@F.pandas_udf("string")
def detect_lang_udf(text: pd.Series) -> pd.Series:
    from ..functions.text import detect_language

    return detect_language(text)
