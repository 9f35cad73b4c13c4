"""Physical-plan inspection helpers.

The engine's performance discipline (SURVEY.md §4): filters and
projections must reach the parquet scan, small dims must broadcast,
and hot-path expressions must stay inside whole-stage codegen. These
helpers make those properties ASSERTABLE in tests instead of manual
`.explain()` eyeballing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan advertises pushed filters mentioning each
    fragment (column name etc.)."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter on {frag!r} not pushed:\n{joined}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, max_cols: int) -> None:
    """Assert column pruning: the scan's ReadSchema for the matching
    scan node carries at most `max_cols` columns."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            cols = line.split("struct<", 1)[-1].count(":")
            if cols <= max_cols:
                return
    raise AssertionError(
        f"no scan with ≤{max_cols} columns found for {table_fragment}:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def window_subtree_node_ids(plan: str) -> list[set[int]]:
    """For each Window node in the formatted plan's tree section,
    return the set of node ids in its subtree (the Window itself
    excluded). Lets tests assert WHAT a window sorts — e.g. that a
    top-k window's input is a boundary-pruned survivor set, not the
    corpus-sized scored relation."""
    import re

    tree = plan.split("\n\n", 1)[0]
    nodes: list[tuple[int, str, int]] = []  # (depth col, name, id)
    for line in tree.splitlines():
        m = re.search(r"([A-Za-z]\w*)[^()]*\((\d+)\)\s*$", line)
        if m:
            col = line.index(m.group(1))
            # whole-stage-codegen nodes print as "+- * Name (id)" —
            # the "* " shifts the NAME column +2 without changing the
            # tree depth; normalize so an equal-depth codegen sibling
            # is never misread as part of the previous subtree
            if line[max(0, col - 2): col] == "* ":
                col -= 2
            nodes.append((col, m.group(1), int(m.group(2))))
    out: list[set[int]] = []
    for i, (col, name, _nid) in enumerate(nodes):
        if name != "Window":
            continue
        sub: set[int] = set()
        for c2, _n2, id2 in nodes[i + 1 :]:
            if c2 <= col:
                break
            sub.add(id2)
        out.append(sub)
    return out


def node_detail(plan: str, node_id: int) -> str:
    """The detail block for one node id in a formatted plan."""
    import re

    m = re.search(
        rf"^\({node_id}\) .*?(?=^\(\d+\) |\Z)", plan, re.M | re.S
    )
    return m.group(0) if m else ""


def unpartitioned_windows(plan: str) -> list[str]:
    """Arguments lines of Window nodes with an EMPTY partition spec
    (the single-reducer sort shape). A fully-specified Window prints
    three top-level bracket groups — [functions], [partition],
    [order]; two groups is ambiguous (partition-only windows drop the
    order group), so a 2-group window is unpartitioned only when its
    second group is an ORDER spec (contains ASC/DESC); one group
    (functions only) is always unpartitioned. Tests use this to ban
    corpus-sized global windows: the only allowed unpartitioned window
    over an unbounded relation is `ranking.ranged_row_number`'s
    offsets window, recognizable by its `_rrn_pid` order column (input
    bounded at RANK_RANGES rows)."""
    import re

    out: list[str] = []
    for m in re.finditer(
        r"^\(\d+\) Window\b.*?(?=^\(\d+\) |\Z)", plan, re.M | re.S
    ):
        am = re.search(r"^Arguments: (.*)$", m.group(0), re.M)
        if not am:
            continue
        args = am.group(1)
        groups: list[str] = []
        depth = 0
        cur = ""
        for ch in args:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    continue
            if depth >= 1:
                cur += ch
        if len(groups) == 1 or (
            len(groups) == 2
            and (" ASC" in groups[1] or " DESC" in groups[1])
        ):
            out.append(args)
    return out


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    return count_shuffles_in(physical_plan(df))


def count_shuffles_in(plan: str) -> int:
    """`count_shuffles` over an already-rendered plan string (lets a
    test that needs the plan anyway avoid a second explain render)."""
    import re

    # count detail headers "(n) Exchange" so tree+detail aren't doubled
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def window_nodes(plan: str) -> list[tuple[int, set[int]]]:
    """(node_id, subtree node ids) for each Window in the tree section
    — `window_subtree_node_ids` plus the window's own id, so a test
    can pair a window's Arguments with what it sorts."""
    import re

    tree = plan.split("\n\n", 1)[0]
    nodes: list[tuple[int, str, int]] = []
    for line in tree.splitlines():
        m = re.search(r"([A-Za-z]\w*)[^()]*\((\d+)\)\s*$", line)
        if m:
            col = line.index(m.group(1))
            if line[max(0, col - 2): col] == "* ":
                col -= 2
            nodes.append((col, m.group(1), int(m.group(2))))
    out: list[tuple[int, set[int]]] = []
    for i, (col, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        sub: set[int] = set()
        for c2, _n2, id2 in nodes[i + 1 :]:
            if c2 <= col:
                break
            sub.add(id2)
        out.append((nid, sub))
    return out


def window_partition_columns(plan: str, node_id: int) -> list[str] | None:
    """Column names in one Window node's PARTITION BY spec (attribute
    `#id` suffixes stripped), or None when the node has no partition
    spec (the unpartitioned shape — `unpartitioned_windows`' beat).
    Same bracket-group grammar as `unpartitioned_windows`: three
    groups = [functions][partition][order]; two groups = partition-
    only unless the second group is an ORDER spec."""
    import re

    det = node_detail(plan, node_id)
    am = re.search(r"^Arguments: (.*)$", det, re.M)
    if not am:
        return None
    args = am.group(1)
    groups: list[str] = []
    depth = 0
    cur = ""
    for ch in args:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                continue
        if depth >= 1:
            cur += ch
    part: str | None = None
    if len(groups) >= 3:
        part = groups[1]
    elif len(groups) == 2 and not (
        " ASC" in groups[1] or " DESC" in groups[1]
    ):
        part = groups[1]
    if part is None:
        return None
    return [
        m.group(1) for m in re.finditer(r"([A-Za-z_]\w*)#\d+", part)
    ]
