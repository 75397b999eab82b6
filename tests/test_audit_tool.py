"""Guards for tools/audit_plans.py itself: the ALLOW waiver table is a
plain dict literal, and Python silently keeps only the LAST entry on a
duplicate key — which once dropped a query's CART waiver when a GWIN
entry was added under the same name.  Parse the source and reject
duplicates outright."""

from __future__ import annotations

import ast
from pathlib import Path

AUDIT = Path(__file__).resolve().parents[1] / "tools" / "audit_plans.py"


def _allow_dict_node() -> ast.Dict:
    tree = ast.parse(AUDIT.read_text())
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Name)
            and node.target.id == "ALLOW"
        ):
            assert isinstance(node.value, ast.Dict)
            return node.value
    raise AssertionError("ALLOW dict not found in audit_plans.py")


def test_allow_table_has_no_duplicate_queries():
    d = _allow_dict_node()
    names = [k.value for k in d.keys if isinstance(k, ast.Constant)]
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate ALLOW keys silently drop waivers: {dupes}"


def test_allow_entries_have_no_duplicate_flags():
    d = _allow_dict_node()
    for k, v in zip(d.keys, d.values):
        if not isinstance(v, ast.Dict):
            continue
        flags = [f.value for f in v.keys if isinstance(f, ast.Constant)]
        dupes = {f for f in flags if flags.count(f) > 1}
        assert not dupes, f"{getattr(k, 'value', '?')}: duplicate flags {dupes}"


def test_allow_flags_are_known():
    known = {"CART", "PYUDF", "GSORT", "GWIN", "EXCH", "NOPUSH"}
    d = _allow_dict_node()
    for k, v in zip(d.keys, d.values):
        if not isinstance(v, ast.Dict):
            continue
        for f in v.keys:
            assert (
                isinstance(f, ast.Constant) and f.value in known
            ), f"{getattr(k, 'value', '?')}: unknown audit flag {f!r}"
