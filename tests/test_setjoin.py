"""prefix_filter_pairs: threshold boundary, exactness vs brute force."""

from __future__ import annotations

from itertools import combinations

from monday_etl_spark.extensions.setjoin import prefix_filter_pairs


def _run(spark, sets):
    df = spark.createDataFrame(sets, "doc_id long, sh array<string>")
    return {
        (r.doc_a, r.doc_b): (r.inter, r.union_sz, r.jaccard_ppm)
        for r in prefix_filter_pairs(df).collect()
    }


def test_boundary_inclusive_at_half(spark):
    # J(1,2) = 4/8 = exactly 1/2 -> included; J(1,3) = 3/9 < 1/2 -> excluded
    got = _run(spark, [
        (1, list("abcd")),
        (2, list("abcdefgh")),
        (3, list("abcxyzuvw")),
    ])
    assert got == {(1, 2): (4, 8, 500_000)}


def test_identical_and_disjoint(spark):
    got = _run(spark, [
        (1, list("abc")),
        (2, list("abc")),
        (3, list("xyz")),
    ])
    assert got == {(1, 2): (3, 3, 1_000_000)}


def test_no_false_negatives_vs_brute_force(spark):
    # deterministic pseudo-random token sets; brute force in Python
    sets = []
    for i in range(30):
        # families of 3: docs in a family share a base set and differ by a
        # couple of tokens, so some pairs land above 1/2 and some below
        fam, member = divmod(i, 3)
        toks = {f"f{fam}_t{j}" for j in range(8)}
        toks |= {f"f{fam}_x{member}_{j}" for j in range(member * 2)}
        sets.append((i, sorted(toks)))
    expect = {}
    for (ia, ta), (ib, tb) in combinations(sets, 2):
        sa, sb = set(ta), set(tb)
        inter = len(sa & sb)
        union = len(sa | sb)
        if 2 * inter >= union:
            expect[(ia, ib)] = (inter, union, inter * 1_000_000 // union)
    got = _run(spark, sets)
    assert got == expect
    assert len(expect) > 0  # the fixture actually exercises matches


def test_adversarial_ties_and_boundary(spark):
    # every token appears exactly twice globally -> the rarest-first order
    # is decided ENTIRELY by the (freq, token) tie-break; pairs sit right
    # at the J = 1/2 boundary on both sides
    sets = [
        (1, ["a", "b", "c", "d"]),          # J(1,2) = 2/6 < 1/2
        (2, ["a", "b", "e", "f"]),
        (3, ["c", "d", "e", "f"]),          # J(3,2) = 2/6, J(3,1) = 2/6
        (4, ["g", "h", "i", "j"]),
        (5, ["g", "h", "i", "j", "k", "l", "m", "n"]),  # J(4,5) = 4/8 = 1/2
        (6, ["k", "l", "m", "n"]),          # J(6,5) = 4/8 = 1/2; J(4,6)=0
    ]
    got = _run(spark, sets)
    assert got == {
        (4, 5): (4, 8, 500_000),
        (5, 6): (4, 8, 500_000),
    }
