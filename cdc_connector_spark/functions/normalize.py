"""Value-normalization expression library (all JVM-side Column expressions).

Implements the reference's value-level conversion rules (SURVEY.md §1.2,
``convert_value`` migrate_v3.py:250-280) as composable Spark Column
expressions — no Python UDFs, so every rule stays inside whole-stage codegen
and survives a 100-TB scan:

- F1 bit(1)/tinyint(1) → boolean      (migrate_v3.py:256-265)
- F2 MySQL zero-dates → NULL          (migrate_v3.py:268-270)
- F3 NUL (\\x00) stripped from strings/bytes (migrate_v3.py:273-278)
- F5 identifiers lowercased           (migrate_v3.py:395,590)
- F6 timestamp normalized to UTC      (tests/validation.py:680-683)
- F7 lag minutes                      (tests/validation.py:685-686)
- F8 regex topic→table routing        (connectors/sinks/postgres/trading.json:33-35)
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bit_to_boolean(col: Column | str) -> Column:
    """bit(1) bytes: b'\\x00' → false, anything else → true; NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(c != F.lit(b"\x00"))


def tinyint_to_boolean(col: Column | str) -> Column:
    """tinyint(1) int → bool: 0 → false, non-zero → true; NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(c != 0)


def null_zero_date(col: Column | str) -> Column:
    """MySQL zero-dates ('0000-00-00', '0000-00-00 00:00:00') → NULL.

    Applied to the *string* form before any timestamp cast — casting first
    would silently null or error (SURVEY.md §7 'zero-dates ... before casts').
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(s.startswith("0000-00-00"), F.lit(None).cast("string")).otherwise(s)


def strip_nul_string(col: Column | str) -> Column:
    """Strip NUL (\\x00) characters from strings (PG cannot store them)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(chr(0)), F.lit(""))


def strip_nul_binary(col: Column | str) -> Column:
    """Drop NUL bytes from binary values, preserving all other bytes.

    Pure built-ins: binary → array of single bytes → filter → re-concat.
    """
    # hex → byte pairs → filter "00" → unhex
    pairs = F.expr(
        f"transform(sequence(1, cast(length(hex({_sql_name(col)})) / 2 as int)), "
        f"i -> substring(hex({_sql_name(col)}), cast((i-1)*2+1 as int), 2))"
    )
    kept = F.filter(pairs, lambda h: h != "00")
    return F.unhex(F.array_join(kept, ""))


def _sql_name(col: Column | str) -> str:
    if isinstance(col, str):
        return f"`{col}`"
    raise ValueError("strip_nul_binary requires a column name string")


def lowercase_columns(df: DataFrame) -> DataFrame:
    """All identifiers lowercased at the sink (migrate_v3.py:395,590)."""
    return df.toDF(*[c.lower() for c in df.columns])


def lag_minutes(newer: Column | str, older: Column | str) -> Column:
    """Freshness lag in minutes between two timestamps (float)."""
    a = F.col(newer) if isinstance(newer, str) else newer
    b = F.col(older) if isinstance(older, str) else older
    return (F.unix_timestamp(a) - F.unix_timestamp(b)) / F.lit(60.0)


def route_table_name(topic: str, pattern: str = r"[^.]+\.[^.]+\.(.*)", prefix: str = "") -> str:
    """Topic → sink table routing: regex capture + prefix, lowercased.

    Mirrors the RegexRouter SMT semantics
    (connectors/sinks/postgres/trading.json:32-35): e.g.
    ``xchange_trading_v2.xchange_trading.T_OFFER`` → ``trading_t_offer``.
    Driver-side (names, not data), so plain Python.
    """
    m = re.match(pattern, topic)
    captured = m.group(1) if m else topic
    return (prefix + captured).lower()


def sink_table_name(db: str, table: str) -> str:
    """``<db>_<table>`` lowercased — the reference's flat-namespace naming
    (migrate_v3.py:373)."""
    return f"{db}_{table}".lower()


def normalize_row(
    df: DataFrame,
    *,
    bit_bool_cols: list[str] | None = None,
    tinyint_bool_cols: list[str] | None = None,
    zero_date_cols: list[str] | None = None,
    strip_nul_cols: list[str] | None = None,
    strip_nul_bin_cols: list[str] | None = None,
    casts: Mapping[str, str] | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Apply the full normalization rule-set to a snapshot/changelog frame.

    Order matters: zero-date and NUL rules run on raw strings *before* casts.
    """
    out = df
    for c in zero_date_cols or []:
        out = out.withColumn(c, null_zero_date(c))
    for c in strip_nul_cols or []:
        out = out.withColumn(c, strip_nul_string(F.col(c)))
    for c in strip_nul_bin_cols or []:
        out = out.withColumn(c, strip_nul_binary(c))
    for c in bit_bool_cols or []:
        out = out.withColumn(c, bit_to_boolean(c))
    for c in tinyint_bool_cols or []:
        out = out.withColumn(c, tinyint_to_boolean(c))
    for c, t in (casts or {}).items():
        out = out.withColumn(c, F.col(c).cast(t))
    if lowercase:
        out = lowercase_columns(out)
    return out
