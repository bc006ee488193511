"""Query-plan registry served to the driver via ``__spark_entry__.py``.

``queries.QUERIES`` maps name → callable(spark, sf_dir) → DataFrame;
``oracles.ORACLES`` maps the same names to DuckDB-runnable ANSI SQL.
Names absent from ``ORACLES`` get the driver's weaker rows-only check
(non-SQL-expressible operators such as MinHash-LSH dedup).
"""

from .queries import QUERIES  # noqa: F401
from .oracles import ORACLES  # noqa: F401
