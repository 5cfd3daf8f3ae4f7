"""Escaping helpers for building parsed Spark SQL strings.

The optimization-round SQL-string builders (melt, profiler, minhash)
embed column/table NAMES into SQL text. Spark's default parser treats
backslash sequences inside single-quoted literals as escapes (verified:
'a\\nb' parses to a newline), so doubling quotes alone corrupts any
name containing a backslash. ONE escaper shared by every builder — the
hand-rolled-copies drift class the round-7/round-10 notes warn about.
"""

from __future__ import annotations


def sql_str_lit(s: str) -> str:
    """``s`` as a single-quoted Spark SQL string literal: backslashes
    first (escape-active in the default parser), then quote doubling.

    Assumes ``spark.sql.parser.escapedStringLiterals=false`` (the
    default). Under escapedStringLiterals=true the doubled backslash
    would parse as TWO literal backslashes — load_table's
    external-session shim pins the conf false so a harness-created
    session cannot silently flip the contract (round-12 ADVICE)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def sql_ident(s: str) -> str:
    """``s`` as a backtick-quoted identifier (backslashes are literal
    inside backticks; only the backtick itself needs doubling)."""
    return "`" + s.replace("`", "``") + "`"
