"""X143 edit-distance similarity join — candidate COMPLETENESS pinned by
brute force (pure-Python Levenshtein over all pairs) on adversarial
repeated-gram data, the brute-force DuckDB mirror on real testdata, the
R×S form, parameter contracts, and the no-corpus-cartesian plan."""

from __future__ import annotations

import itertools
import random

import pytest

from briefly_spark.operators.fuzzy import (
    fuzzy_dedup_pairs,
    fuzzy_pairs,
    sql_fuzzy_dedup_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _adversarial_rows():
    """Tiny alphabet → massive gram collisions; short and empty strings →
    the fringe leg; runs of one char → multiset-vs-set gram hazards."""
    random.seed(11)
    strings = ["", "a", "aa", "aaa", "aaaa", "abab", "baba"] + [
        "".join(random.choice("ab") for _ in range(random.randint(0, 8)))
        for _ in range(120)
    ]
    return [(i, s) for i, s in enumerate(strings)]


@pytest.mark.parametrize("max_dist,q", [(0, 2), (1, 2), (2, 2), (2, 3)])
def test_complete_vs_bruteforce_on_adversarial_data(spark, max_dist, q):
    rows = _adversarial_rows()
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    got = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_dedup_pairs(
            df, id_col="id", text_col="name", max_dist=max_dist, q=q
        ).collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= max_dist
    )
    assert got == want  # no missed pair, no extra pair, exact distances


def test_duckdb_bruteforce_mirror_on_testdata(spark, sf_dir):
    """The mirror is deliberately the ALL-PAIRS plan — agreement pins that
    prefix filtering dropped no candidate on the real part names."""
    import duckdb

    from briefly_spark.catalog import load_table, table_path

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    got = sorted(
        tuple(r)
        for r in fuzzy_dedup_pairs(
            part, id_col="p_partkey", text_col="p_name", max_dist=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{table_path(sf_dir, 'part')}'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_fuzzy_dedup_pairs("part", id_col="p_partkey", text_col="p_name", max_dist=3)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 100  # a real matching surface, not a trivial pass


def test_sql_mirror_brute_force_cap_refuses_above_and_noop_below():
    """The written q37-oracle cost ceiling (VERDICT r13 next-round #4):
    the emitted brute-force mirror embeds a count guard that REFUSES —
    a loud DuckDB error() before the quadratic join starts, not a
    multi-hour wedge — when the input exceeds ``brute_cap``.  Under the
    cap the guard is a value-level no-op.  The default cap
    (SQL_BRUTE_FORCE_CAP=20k) keeps 2x margin over the sf0.1 corpus
    (10k); above it the pin strategy switches to the committed sf0.1
    evidence + the pure-python/hypothesis pins in this file."""
    import duckdb

    from briefly_spark.operators.fuzzy import SQL_BRUTE_FORCE_CAP

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT i AS id, 'ab' || CAST(i % 5 AS VARCHAR) AS txt "
        "FROM range(50) r(i)"
    )
    capped = sql_fuzzy_dedup_pairs("t", id_col="id", text_col="txt", max_dist=1, brute_cap=49)
    with pytest.raises(duckdb.Error, match="SQL_BRUTE_FORCE_CAP"):
        con.execute(capped).fetchall()
    # under the cap: identical rows to the unguarded r13 form
    ok = sql_fuzzy_dedup_pairs("t", id_col="id", text_col="txt", max_dist=1, brute_cap=50)
    unguarded = sql_fuzzy_dedup_pairs(
        "t", id_col="id", text_col="txt", max_dist=1, brute_cap=10**12
    )
    got = sorted(con.execute(ok).fetchall())
    assert got == sorted(con.execute(unguarded).fetchall())
    assert len(got) > 0
    # the default ceiling keeps its documented 2x margin over the largest
    # gate-swept corpus (sf0.1 -> 10k docs); q37's oracle relies on that
    assert SQL_BRUTE_FORCE_CAP >= 20_000


def test_rxs_form_nulls_and_contracts(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zzz"), (3, None)], "id LONG, name STRING"
    )
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "acme c0rp"), (12, "unrelated")],
        "id LONG, name STRING",
    )
    got = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_pairs(
            left, right, id_col="id", text_col="name", max_dist=1
        ).collect()
    )
    assert got == [(1, 10, 1), (1, 11, 1)]  # NULL text excluded, no cross hits
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_pairs(left, right, id_col="id", text_col="name", max_dist=-1)
    with pytest.raises(ValueError, match="q >= 2"):
        fuzzy_pairs(left, right, id_col="id", text_col="name", q=1)


def test_no_corpus_cartesian_plan(spark, sf_dir):
    """The candidate stage is a gram equi-join; the only nested-loop legs
    are the length-filtered fringe (broadcast, len ≤ q·d-q+1 slivers) —
    never an unfiltered corpus cross."""
    from briefly_spark.catalog import load_table

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    out = fuzzy_dedup_pairs(part, id_col="p_partkey", text_col="p_name", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan  # the exact verify is in-plan, JVM-side
    assert "BatchEvalPython" not in plan  # no Python in the hot path


def test_unicode_is_character_level_vs_pure_python(spark):
    """Spark's surface is CHARACTER-level Levenshtein (the intended
    semantics); the DuckDB mirror is byte-level and therefore ASCII-scoped
    (documented).  Pin the unicode behavior against the pure-Python
    character reference, brute-force complete."""
    rows = [
        (1, "café au lait"), (2, "cafe au lait"), (3, "caffè au lait"),
        (4, "unrelated xyz"), (5, "日本語 テスト 文字"), (6, "日本語 テスト 文字列"),
    ]
    got = sorted(
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_dedup_pairs(
            spark.createDataFrame(rows, "id LONG, s STRING"),
            id_col="id", text_col="s", max_dist=2,
        ).collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 2
    )
    assert got == want
    assert (5, 6, 1) in got  # multi-byte chars count as single edits


# -- hypothesis sweep of the prefix-filter theorem itself --------------------
# Per-example Spark jobs would make hypothesis unusable, so the candidate
# generation (grams → global rarity order → q·d+1 prefix → shared-gram
# pairs ∪ fringe) is replicated EXACTLY in pure Python and fuzzed against
# brute force; the Spark implementation's agreement with this algorithm is
# what the fixed-seed tests above pin.
def _py_candidates(strings: list[str], q: int, d: int) -> set[tuple[int, int]]:
    pad = "\x01" * (q - 1)
    grams = {}
    for i, s in enumerate(strings):
        p = pad + s + pad
        grams[i] = [(p[j : j + q], j) for j in range(len(p) - q + 1)]
    freq: dict[str, int] = {}
    for occ in grams.values():
        for g, _ in occ:
            freq[g] = freq.get(g, 0) + 1
    keep = q * d + 1
    prefix = {
        i: {g for g, _ in sorted(occ, key=lambda t: (freq[t[0]], t[0], t[1]))[:keep]}
        for i, occ in grams.items()
    }
    cand = {
        (i, j)
        for i in prefix
        for j in prefix
        if i < j and prefix[i] & prefix[j]
    }
    short = q * d - q + 1
    for i, si in enumerate(strings):
        for j, sj in enumerate(strings):
            if i < j and (
                (len(si) <= short and len(sj) <= short + d)
                or (len(sj) <= short and len(si) <= short + d)
            ):
                cand.add((i, j))
    return cand


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    strings=st.lists(st.text(alphabet="ab", max_size=10), min_size=2, max_size=25),
    d=st.integers(min_value=0, max_value=3),
    q=st.integers(min_value=2, max_value=4),
)
def test_prefix_filter_candidate_completeness_hypothesis(strings, d, q):
    """Every pair within edit distance d is a candidate — the theorem the
    whole operator stands on, fuzzed over repeated-gram-heavy corpora."""
    cand = _py_candidates(strings, q, d)
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            if _lev(strings[i], strings[j]) <= d:
                assert (i, j) in cand, (strings[i], strings[j], d, q)
