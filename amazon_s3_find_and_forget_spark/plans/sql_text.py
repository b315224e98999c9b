"""Find-query SQL text generation (audit / debug / external-engine mode).

The reference renders its Find as Athena SQL text with hand-rolled
escaping (reference: backend/lambdas/tasks/execute_query.py:78-137,
escaping 140-160; golden-tested at tests/unit/tasks/test_execute_query.py).
The Spark engine does not NEED SQL text — the DataFrame plan in
plans/find.py is the execution path — but the rendered statement remains
useful: as an audit artifact attached to job events, for running the
same Find on an external SQL engine, and for debugging.

Differences from the reference, deliberate:
- Spark SQL dialect: backtick-quoted identifiers (`` ` `` doubled), dot
  paths become nested-field access, `input_file_name()` replaces
  Athena's ``"$path"`` pseudo-column;
- typed predicates instead of the cast-everything-to-varchar manifest
  join: the generated text is a WHERE-clause compilation of the typed
  column groups, so it prunes like the DataFrame plan does;
- injection-safe by the same rules: identifiers double their quote
  character, string literals double ``'``, numbers pass through,
  ``None`` renders as NULL (never matches).
"""

from __future__ import annotations

from decimal import Decimal

from ..matches import ColumnGroup


def escape_identifier(dot_path: str) -> str:
    """`a.b` -> `` `a`.`b` `` (backticks doubled inside segments)."""
    return ".".join(
        "`{}`".format(seg.replace("`", "``")) for seg in dot_path.split(".")
    )


def escape_literal(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, Decimal):
        return f"CAST('{value}' AS DECIMAL(38,{max(-value.as_tuple().exponent, 0)}))"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        return "'{}'".format(value.replace("'", "''"))
    raise ValueError(f"Unable to render literal of type {type(value).__name__}")


def group_predicate_sql(group: ColumnGroup) -> str:
    if not group.composite:
        col = escape_identifier(group.columns[0])
        in_list = ", ".join(escape_literal(v) for v in group.values)
        return f"{col} IN ({in_list})"
    tuples = []
    for tup in group.values:
        members = " AND ".join(
            f"{escape_identifier(c)} = {escape_literal(v)}"
            for c, v in zip(group.columns, tup)
        )
        tuples.append(f"({members})")
    return "(" + " OR ".join(tuples) + ")"


def find_query_sql(
    table: str,
    groups: list[ColumnGroup],
    partition_filters: list[tuple[str, object]] | None = None,
) -> str:
    """Render the Find as one Spark SQL statement.

    One WHERE clause OR-combining every column group (the reference's
    UNION ALL of one-SELECT-per-group collapses — same rows, one scan),
    plus optional partition-key equality filters (P4)."""
    preds = " OR ".join(group_predicate_sql(g) for g in groups) or "FALSE"
    parts = "".join(
        f" AND {escape_identifier(k)} = {escape_literal(v)}"
        for k, v in (partition_filters or [])
    )
    return (
        "SELECT DISTINCT input_file_name() AS file_path "
        f"FROM {escape_identifier(table)} "
        f"WHERE ({preds}){parts}"
    )
