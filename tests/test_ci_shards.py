"""CI-shard coverage guard: the regular_tests matrix in ci.yml hard-codes
per-shard file lists (the suite is compile-bound on one core, so it runs
as 3 parallel shards); this test fails when a new tests/test_*.py is not
listed in any shard — the silent-coverage-hole failure auto-discovery
used to prevent."""

import os
import re


def test_every_test_file_is_in_a_ci_shard():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ci = open(os.path.join(root, ".github", "workflows", "ci.yml")).read()
    listed = set(re.findall(r"tests/test_[a-z0-9_]+\.py", ci))
    on_disk = {
        "tests/" + f for f in os.listdir(os.path.dirname(__file__))
        if f.startswith("test_") and f.endswith(".py")
    }
    missing = sorted(on_disk - listed)
    assert not missing, (
        "tests missing from every ci.yml shard (add to a matrix entry): "
        + ", ".join(missing)
    )
