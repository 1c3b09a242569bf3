"""Brute-force equality properties for the session-4 operator family:
each test materializes a seeded randomized corpus as a parquet table
shaped like the driver's testdata, runs the REGISTERED query (the
production path, not a reimplementation), and compares against a plain
Python brute force."""

import random

from pyspark.sql import functions as F

from cies_ocr_java_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/{name}.parquet")
    return d


def test_pareto_frontier_matches_brute_force(spark, tmp_path):
    """The two-window skyline must equal the O(n^2) dominance scan —
    including exact-duplicate rows (dominance needs one strict
    inequality, so identical points all survive) and same-price ties."""
    rng = random.Random(11)
    rows = []
    for i in range(120):
        rows.append(
            (i, f"n{i}", "B", f"T{rng.randint(0, 2)}", rng.randint(1, 12),
             float(rng.randint(100, 999)) / 10)
        )
    rows.append((900, "dupA", "B", "T0", rows[0][4], rows[0][5]))  # exact dup
    rows.append((901, "tie", "B", "T1", 1, rows[1][5]))
    sf = _write(
        spark, tmp_path, "part", rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        "p_size int, p_retailprice double",
    )
    got = {
        r["p_partkey"]
        for r in QUERIES["pareto_frontier_parts"](spark, sf).collect()
    }
    pts = [(k, t, round(p * 100), s) for (k, _, _, t, s, p) in rows]
    expected = set()
    for k, t, pc, s in pts:
        dominated = any(
            qt == t and qpc <= pc and qs <= s and (qpc < pc or qs < s)
            for (qk, qt, qpc, qs) in pts
            if qk != k
        )
        if not dominated:
            expected.add(k)
    assert got == expected


def test_dup_ngram_coverage_matches_brute_force(spark, tmp_path):
    """Interval-union coverage from the lead-window formulation must
    equal a literal Python union of [pos, pos+7] windows over duplicated
    grams — tiny vocab forces heavy overlap and adjacent/contained
    interval cases."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(6)]
    docs = []
    for i in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(8, 40))]
        docs.append((i, " ".join(toks), "en", "s", len(" ".join(toks))))
    sf = _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["covered_tokens"])
        for r in QUERIES["dup_ngram_coverage"](spark, sf).collect()
    }
    W = 8
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for did, text, *_ in docs:
        toks = text.split()
        gs = [tuple(toks[i:i + W]) for i in range(len(toks) - W + 1)]
        per_doc[did] = (toks, gs)
        grams.update(gs)
    for did, (toks, gs) in per_doc.items():
        if len(toks) < W:
            assert did not in out
            continue
        dup_pos = [i for i, g in enumerate(gs) if grams[g] >= 2]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + W))
        assert out[did] == (len(toks), len(dup_pos), len(covered)), did
    assert set(out) == {d for d, (t, _) in per_doc.items() if len(t) >= W}


def test_rolling_distinct_users_matches_brute_force(spark, tmp_path):
    """The contribute-forward explode must equal a literal per-day
    trailing-7-day distinct scan."""
    import datetime

    rng = random.Random(17)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(400):
        rows.append(
            (i, base + datetime.timedelta(
                days=rng.randint(0, 20), seconds=rng.randint(0, 86399)),
             rng.randint(1, 9), "click", 1.0, "{}")
        )
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string",
    )
    got = {
        r["day_num"]: r["active_users_7d"]
        for r in QUERIES["rolling_distinct_users"](spark, sf).collect()
    }
    ud = {(u, (ts - datetime.datetime(1970, 1, 1)).days)
          for (_, ts, u, *_r) in rows}
    days = sorted({d for _, d in ud})
    expected = {}
    for d in range(days[0], days[-1] + 1):
        expected[d] = len({u for (u, dd) in ud if d - 6 <= dd <= d})
    assert got == expected


def test_budget_trim_is_maximal_prefix(spark):
    """kept must be a PREFIX per doc (monotone: once a span is dropped,
    every later span is dropped) and maximal (the first dropped span
    would not have fit)."""
    out = (
        QUERIES["interleaved_budget_trim"](spark, SF)
        .orderBy("doc_id", "span_order")
        .collect()
    )
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in out:
        by_doc[r["doc_id"]].append(r)
    budget = 96
    for did, rows in by_doc.items():
        seen_drop = False
        cum = 0
        for r in rows:
            if r["kept"]:
                assert not seen_drop, did  # prefix property
                cum += r["n_tok"]
                assert cum <= budget, did
            else:
                if not seen_drop:
                    assert cum + r["n_tok"] > budget, did  # maximality
                seen_drop = True
