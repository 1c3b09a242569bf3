"""Registry integrity: unique names, oracle coverage, fail-loud _register.

Round-3 verdict finding #1: a duplicate @_register("media_ico_decode")
silently overwrote the first implementation+oracle, leaving dead code that
was never oracle-checked yet still counted by a decorator grep. _register
now raises at import time on a duplicate name; these tests pin that and the
registry-wide invariants that made the bug detectable.
"""

import re
from pathlib import Path

import pytest

from cies_ocr_java_spark.plans import queries as q


def test_register_raises_on_duplicate_name():
    with pytest.raises(ValueError, match="duplicate query registration"):

        @q._register("q1_pricing_summary")
        def _dup(spark, sf_dir):  # pragma: no cover - never runs
            raise AssertionError


def test_decorator_count_equals_registry_size():
    # The naive grep the round-3 judge ran: every @_register decorator in
    # the source must correspond to a LIVE registry entry (no shadowing).
    src = Path(q.__file__).read_text()
    names = re.findall(r"@_register\(\s*\n?\s*['\"]([a-z0-9_]+)['\"]", src)
    assert len(names) == len(set(names)), sorted(
        n for n in set(names) if names.count(n) > 1
    )
    assert set(names) == set(q.QUERIES)


def test_every_registered_query_has_an_oracle_or_documented_exception():
    # oracle_sql() omissions are allowed only for genuinely
    # non-SQL-expressible ops; today there are none — every entry is
    # exactness-checked. If a future entry must omit its oracle, list it
    # here explicitly so the weaker rows-only check is a visible choice.
    allowed_no_oracle: set[str] = set()
    missing = set(q.QUERIES) - set(q.ORACLES) - allowed_no_oracle
    assert not missing, sorted(missing)


def test_both_ico_variants_are_distinct_entries():
    assert "media_ico_decode" in q.QUERIES
    assert "media_ico_multi_decode" in q.QUERIES
    assert (
        q.QUERIES["media_ico_decode"]
        is not q.QUERIES["media_ico_multi_decode"]
    )
