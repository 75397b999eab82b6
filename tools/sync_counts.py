"""Round-close count sync (VERDICT r12 #6): README/SCALING counts are
DERIVED, not prose — the r12 round drifted by one test within a single
round of the tally being hand-written.  Sources of truth:

- test count: ``pytest tests/ --collect-only -q`` (the collector);
- query/oracle count: ``len(__spark_entry__.queries())`` (the registry);
- sf1 quiet-stamp tally: ``SCALING_CURVE.json`` provenance entries.

Usage: python tools/sync_counts.py          # rewrite in place
       python tools/sync_counts.py --check  # exit 1 on drift, no writes
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def collect_test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise RuntimeError(
            f"could not parse collector output:\n{out.stdout[-2000:]}"
        )
    return int(m.group(1))


def registry_counts() -> tuple[int, int]:
    import __spark_entry__ as entrymod

    return len(entrymod.queries()), len(entrymod.oracle_sql())


def quiet_count() -> int:
    with open(os.path.join(ROOT, "SCALING_CURVE.json")) as f:
        curve = json.load(f)
    prov = curve["sf1"].get("provenance", {})
    return sum(1 for v in prov.values() if v == "quiet")


def _sub(text: str, pattern: str, repl: str, path: str) -> tuple[str, int]:
    new, n = re.subn(pattern, repl, text)
    if n == 0:
        raise RuntimeError(f"{path}: pattern not found: {pattern!r}")
    return new, n


def main() -> int:
    check = "--check" in sys.argv
    n_tests = collect_test_count()
    n_queries, n_oracles = registry_counts()
    n_quiet = quiet_count()
    print(
        f"derived: {n_tests} tests, {n_queries} queries, "
        f"{n_oracles} oracles, {n_quiet} quiet sf1 stamps"
    )

    drift = False
    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    orig = readme
    readme, _ = _sub(
        readme,
        r"(tests/\s+)\d+( tests \(0 skips\))",
        rf"\g<1>{n_tests}\g<2>",
        readme_path,
    )
    readme, _ = _sub(
        readme,
        r"full suite: \d+ passed, 0 skips",
        f"full suite: {n_tests} passed, 0 skips",
        readme_path,
    )
    readme, _ = _sub(
        readme,
        r"\d+ queries, \d+ DuckDB",
        f"{n_queries} queries, {n_oracles} DuckDB",
        readme_path,
    )
    if readme != orig:
        drift = True
        if not check:
            with open(readme_path, "w") as f:
                f.write(readme)
            print("README.md counts rewritten")

    scaling_path = os.path.join(ROOT, "SCALING.md")
    with open(scaling_path) as f:
        scaling = f.read()
    orig = scaling
    scaling, _ = _sub(
        scaling,
        r"\*\*\d+ rows now stamped `quiet`\*\*",
        f"**{n_quiet} rows now stamped `quiet`**",
        scaling_path,
    )
    if scaling != orig:
        drift = True
        if not check:
            with open(scaling_path, "w") as f:
                f.write(scaling)
            print("SCALING.md quiet tally rewritten")

    if not drift:
        print("all counts already in sync")
    return 1 if (check and drift) else 0


if __name__ == "__main__":
    sys.exit(main())
