"""Property-based tests (hypothesis) for the engine's core invariants —
the randomized tier the reference lacks (SURVEY.md §5: 'no
property-based tests' there; we add them):

  * exact.py determinism: decimal aggregation is partition-order
    independent (THE property that makes oracle hashing sound);
  * salted_join ≡ plain join on arbitrary key distributions (incl.
    pathological all-one-key skew);
  * CDC latest_op/apply semantics: applying an op-log equals replaying
    it in any chunking.

Data volumes are tiny (tens of rows) — these probe semantics, not scale;
deadlines are disabled because Spark job latency dwarfs hypothesis'
defaults.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROPS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, cents) rows: money quantized to 2dp like the fixtures
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=-10**7, max_value=10**7),
    ),
    min_size=1,
    max_size=60,
)


@PROPS
@given(rows=rows_strategy, nparts=st.integers(min_value=1, max_value=7))
def test_decimal_sum_partition_invariant(spark, rows, nparts):
    """dsum over decimal is identical for every partitioning of the same
    rows — the determinism exact.py promises."""
    from kube_etl_spark.exact import dsum, money

    df = spark.createDataFrame(
        [(k, c / 100.0) for k, c in rows], "k int, v double"
    )
    a = (
        df.repartition(1)
        .groupBy("k").agg(dsum(money("v")).alias("s"))
        .collect()
    )
    b = (
        df.repartition(nparts)
        .groupBy("k").agg(dsum(money("v")).alias("s"))
        .collect()
    )
    assert sorted((r["k"], r["s"]) for r in a) == sorted((r["k"], r["s"]) for r in b)


@PROPS
@given(
    fact=st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=40),
    dim=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=6),
)
def test_salted_join_equals_plain_join(spark, fact, dim):
    """Salting never changes join results — including all-rows-one-key
    skew and empty sides."""
    from kube_etl_spark.queries.scale import salted_join

    fdf = spark.createDataFrame([(k,) for k in fact], "fk int")
    ddf = spark.createDataFrame(
        [(k, f"d{k}-{i}") for i, k in enumerate(set(dim))], "dk int, payload string"
    )
    plain = sorted(
        (r["fk"], r["payload"])
        for r in fdf.join(ddf, fdf.fk == ddf.dk).collect()
    )
    salted = sorted(
        (r["fk"], r["payload"])
        for r in salted_join(fdf, ddf, "fk", "dk").collect()
    )
    assert salted == plain


@PROPS
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.booleans(),                            # is_delete
            st.integers(min_value=0, max_value=999),  # payload
        ),
        min_size=1,
        max_size=30,
    ),
    split=st.integers(min_value=1, max_value=29),
)
def test_oplog_apply_chunking_invariant(spark, tmp_path_factory, ops, split):
    """Applying an op-log in one MERGE equals applying it in two chunks
    (any split point) — the micro-batch-boundary independence the CDC
    sink needs."""
    from kube_etl_spark.streaming.cdc import StateTable

    schema = "seq long, key long, op string, value long"
    rows = [
        (i, k, "delete" if d else "upsert", v) for i, (k, d, v) in enumerate(ops)
    ]
    split = min(split, len(rows))

    def final_state(chunks):
        st_dir = tmp_path_factory.mktemp("state")
        table = StateTable(spark, str(st_dir / "t"), ["key"], "seq")
        for chunk in chunks:
            if chunk:
                table.merge_batch(spark.createDataFrame(chunk, schema))
        out = table.read()
        return sorted(
            (r["key"], r["seq"], r["value"]) for r in (out.collect() if out is not None else [])
        )

    assert final_state([rows]) == final_state([rows[:split], rows[split:]])


def test_salt_is_stable_under_recomputation(spark):
    """The salt is a pure function of row VALUES (VERDICT r2 #2): the
    same rows must get the same salt regardless of physical
    partitioning — exactly what a task retry changes. The old
    monotonically_increasing_id-based salt fails this (mid encodes the
    partition id)."""
    from pyspark.sql import functions as F

    rows = [(k, f"p{i}") for i, k in enumerate([1] * 30 + [2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "fk int, payload string")
    salt = F.pmod(F.xxhash64("fk", "payload"), F.lit(8)).alias("salt")

    def salts(nparts):
        return sorted(
            (r["fk"], r["payload"], r["salt"])
            for r in df.repartition(nparts).select("fk", "payload", salt).collect()
        )

    one = salts(1)
    assert one == salts(7) == salts(13)
    # and the hot key's rows actually spread over multiple salts
    hot = {s for k, _, s in one if k == 1}
    assert len(hot) > 1


def test_gram_instances_count_invariant(spark):
    """_gram_instances(t, n) must yield exactly max(0, |t| - n + 1)
    grams for every document — including the size<n guard where an
    unguarded sequence() would descend and error."""
    from pyspark.sql import functions as F

    from kube_etl_spark.queries.llm import _gram_instances, _tokens

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["", "a", "a b", "a b c", "a b c d", "x y z w v u"]
        )],
        "doc_id long, text string",
    )
    for n in (2, 3, 5):
        rows = docs.select(
            "doc_id",
            F.size(_tokens(F.col("text"))).alias("nt"),
            F.size(_gram_instances(_tokens(F.col("text")), n)).alias("ng"),
        ).collect()
        for r in rows:
            assert r["ng"] == max(0, r["nt"] - n + 1), (n, r)


def test_morton_value_locality(spark):
    """Morton interleave invariants on normalized inputs: monotone in
    each argument with the other fixed, and bounded by 2^(2*bits)."""
    from pyspark.sql import functions as F

    from kube_etl_spark.plans.layout import morton_value

    pts = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 7)]
    df = spark.createDataFrame(pts, "a long, b long").withColumn(
        "z", morton_value(F.col("a"), F.col("b"), bits=6)
    )
    rows = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for (a, b), z in rows.items():
        assert 0 <= z < 1 << 12
        if (a + 7, b) in rows:
            assert rows[(a + 7, b)] > z
        if (a, b + 7) in rows:
            assert rows[(a, b + 7)] > z


def test_scd2_intervals_partition_time_per_key(spark):
    """Property (hypothesis over random op-logs): per key, SCD2
    intervals are disjoint, ordered, and chain exactly — each row's
    valid_to equals the next op's ts (delete or not), only the last
    surviving row is open-ended, and no interval is empty unless two
    ops share a timestamp."""
    from hypothesis import given, settings, strategies as st

    from kube_etl_spark.streaming.cdc import scd2_history

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),          # key
                st.integers(0, 10_000),     # ts offset seconds (may collide)
                st.booleans(),              # is delete
            ),
            min_size=1,
            max_size=30,
        )
    )
    def run(ops):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (
                k,
                i,  # seq = arrival order, unique
                base + datetime.timedelta(seconds=s),
                "delete" if d else "upsert",
                "p",
            )
            for i, (k, s, d) in enumerate(ops)
        ]
        df = spark.createDataFrame(
            rows, "key long, seq long, ts timestamp, op string, payload string"
        )
        hist = scd2_history(df, ["key"], "seq", "ts").collect()
        by_key: dict[int, list] = {}
        for r in sorted(hist, key=lambda r: (r["key"], r["seq"])):
            by_key.setdefault(r["key"], []).append(r)
        # reconstruct each key's full op sequence for the chain check
        ops_by_key: dict[int, list] = {}
        for k, i, ts, op, _ in sorted(rows, key=lambda t: t[1]):
            ops_by_key.setdefault(k, []).append((i, ts, op))
        for k, vers in by_key.items():
            seqs = [v["seq"] for v in vers]
            assert seqs == sorted(seqs)
            key_ops = ops_by_key[k]
            next_ts = {key_ops[j][0]: key_ops[j + 1][1] for j in range(len(key_ops) - 1)}
            for v in vers:
                if v["seq"] in next_ts:
                    assert v["valid_to"] == next_ts[v["seq"]]
                    assert not v["is_current"]
                else:
                    assert v["valid_to"] is None and v["is_current"]
            assert sum(1 for v in vers if v["is_current"]) <= 1

    run()
