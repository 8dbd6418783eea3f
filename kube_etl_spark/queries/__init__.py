"""Query modules — importing this package populates the registry.

One module per SURVEY.md §2 operator family. Each module is pure
declaration: PySpark DataFrame expressions + the paired DuckDB oracle.
"""

from . import (  # noqa: F401
    aggregates,
    commerce,
    filters,
    functions,
    growth,
    joins,
    llm,
    mediaq,
    quality,
    scale,
    scans,
    sequences,
    setops,
    subqueries,
    timeseries,
    tpch,
    streamlike,
    udfs,
    windows,
)
