"""etl_portfolio_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline (Harsha-DA-21/ETL-Portfolio-Project, studied at
/root/reference/): two-source extraction (Postgres join pushdown +
Mongo projection), a left-join enrichment, fuzzy region cleanup, a
9-metric row-level loan derivation, a table-generating monthly-schedule
expansion with a running total, and full-replace table sinks — plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns, streaming) designed for 100 TB scale.

Design stance (see SURVEY.md §7.0):
- Declarative DataFrame/SQL plans; Catalyst does pushdown/pruning/join
  selection. No RDDs, no driver-side loops.
- Built-in `pyspark.sql.functions` everywhere the semantics allow —
  the entire reference transform surface compiles to whole-stage
  codegen with ZERO Python UDFs on the hot path.
- Deterministic `as_of_date` parameter instead of wall-clock
  (`/root/reference/main.py:80` captures `datetime.today()`).
- Explicit partitioning strategy per operator, AQE on, broadcast for
  dimension tables, skew-aware joins. Every operator documents its
  100 TB behavior in its docstring.
"""

__version__ = "0.1.0"
