"""Plan introspection helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `formatted` explain output as a string (what `.explain` prints),
    used by the plan audit and tests to assert physical properties."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
