"""Property-based tests (hypothesis): kernel invariants under randomized
inputs, checked against brute-force Python references.

The reference's tests assert structural invariants on fixed fixtures
(SURVEY §5); these go further — any counterexample here is a real bug, found
without hand-picking inputs. Examples are kept small (Spark round-trip per
example), so shrinkage stays fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_meta_spark import operators as ops
from iceberg_meta_spark.functions import display

SET = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _spark_round(x: float, scale: int) -> float:
    """Spark's round(): HALF_UP over the double's shortest repr. Python's
    built-in round() is half-even over the exact binary value; the two
    diverge on ~0.3% of inputs, so reference values must emulate Spark."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))

intervals = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 200)),  # (lo, length)
    min_size=0,
    max_size=25,
)


@given(iv=intervals)
@SET
def test_sweepline_matches_bruteforce(spark, iv):
    rows = [(f"f{i:03d}", lo, lo + ln) for i, (lo, ln) in enumerate(iv)]
    # brute force: a file overlaps a predecessor iff max(hi) of files before
    # it in (lo, path) order >= its lo  (the reference sweep-line semantics)
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    expect, run_max = 0, None
    for _, lo, hi in ordered:
        if run_max is not None and run_max >= lo:
            expect += 1
        run_max = hi if run_max is None else max(run_max, hi)
    df = spark.createDataFrame(rows, "file_path string, lo long, hi long") if rows else (
        spark.createDataFrame([], "file_path string, lo long, hi long")
    )
    got = ops.overlap_sweepline(df).collect()[0]
    assert got.overlapping_files == expect
    assert got.file_count == len(rows)


@given(iv=st.lists(st.tuples(st.integers(0, 100), st.integers(0, 50)), min_size=0, max_size=12))
@SET
def test_pair_count_matches_bruteforce(spark, iv):
    rows = [(f"f{i:03d}", lo, lo + ln) for i, (lo, ln) in enumerate(iv)]
    expect = sum(
        1
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if rows[i][1] <= rows[j][2] and rows[j][1] <= rows[i][2]
    )
    df = spark.createDataFrame(rows, "file_path string, lo long, hi long") if rows else (
        spark.createDataFrame([], "file_path string, lo long, hi long")
    )
    got = ops.overlap_pair_count(df).collect()
    if rows:
        assert got[0].overlapping_pairs == expect
    else:
        assert got[0].overlapping_pairs == 0 or got == []


@given(sizes=st.lists(st.integers(0, 10**13), min_size=1, max_size=20))
@SET
def test_file_stats_invariants(spark, sizes):
    df = spark.createDataFrame([(s,) for s in sizes], "file_size_in_bytes long")
    r = ops.file_size_stats(df).collect()[0]
    assert r.file_count == len(sizes)
    assert r.total_size == sum(sizes)
    assert r.min_size == min(sizes) and r.max_size == max(sizes)
    assert r.min_size <= r.median_size <= r.max_size
    assert abs(r.avg_size - sum(sizes) / len(sizes)) < 1e-6 * max(1, max(sizes))
    srt = sorted(sizes)
    n = len(srt)
    exact_median = srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) / 2
    assert r.median_size == float(exact_median)


@given(
    counts=st.lists(
        st.tuples(st.text(alphabet="abcde", min_size=1, max_size=1), st.integers(1, 30)),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_skew_invariants(spark, counts):
    rows = [
        (k, f"fp_{k}_{i}", 10, 100)
        for k, n in counts
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "part_key string, file_path string, record_count long, file_size_in_bytes long")
    out = ops.partition_skew(df).collect()
    per_key: dict[str, int] = {}
    for k, n in counts:
        per_key[k] = per_key.get(k, 0) + n
    avg = sum(per_key.values()) / len(per_key)

    def round_half_up(x: float) -> float:
        # Spark's round() is HALF_UP (as is DuckDB's); Python's is banker's.
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))

    assert len(out) == len(per_key)
    for r in out:
        assert r.file_count == per_key[r.part_key]
        assert r.skewed == (r.file_count > 2 * avg)
        assert abs(r.skew_ratio - round_half_up(r.file_count / avg)) < 1e-9
    # at least one partition reaches the max ratio; ratios bounded by max/avg
    assert max(r.skew_ratio for r in out) == round_half_up(max(per_key.values()) / avg)


@given(v=st.integers(0, 2**55))
@SET
def test_format_bytes_matches_python(spark, v):
    def py_format(n: int) -> str:
        units = (("B", 1), ("KB", 1024), ("MB", 1024**2), ("GB", 1024**3),
                 ("TB", 1024**4), ("PB", 1024**5))
        for unit, base in units:
            if n < base * 1024 or unit == "PB":
                scaled = (n * 10 + base // 2) // base  # half-up one-decimal, like the kernel
                return f"{scaled // 10}.{scaled % 10} {unit}"
        raise AssertionError
    df = spark.createDataFrame([(v,)], "v long")
    got = df.select(display.format_bytes(F.col("v")).alias("s")).collect()[0].s
    assert got == py_format(v)


@given(
    old=st.sets(st.integers(0, 30), max_size=15),
    new=st.sets(st.integers(0, 30), max_size=15),
)
@SET
def test_diff_partitions_path_sets(spark, old, new):
    mk = lambda ids: [(f"p{i}", 5, 50) for i in sorted(ids)]
    schema = "file_path string, record_count long, file_size_in_bytes long"
    df_old = spark.createDataFrame(mk(old), schema) if old else spark.createDataFrame([], schema)
    df_new = spark.createDataFrame(mk(new), schema) if new else spark.createDataFrame([], schema)
    rows = ops.snapshot_diff(df_old, df_new).collect()
    added = {r.file_path for r in rows if r.change == "added"}
    deleted = {r.file_path for r in rows if r.change == "deleted"}
    assert added == {f"p{i}" for i in new - old}
    assert deleted == {f"p{i}" for i in old - new}
    assert not (added & deleted)


@given(
    n_tokens=st.integers(0, 60),
    chunk=st.integers(2, 12),
    overlap_frac=st.integers(0, 99),
)
@SET
def test_chunking_covers_every_token_exactly(spark, n_tokens, chunk, overlap_frac):
    from iceberg_meta_spark.pipeline.text import chunk_documents

    overlap = overlap_frac * (chunk - 1) // 100  # 0 <= overlap < chunk
    stride = chunk - overlap
    text = " ".join(f"w{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk, overlap).collect(), key=lambda r: r.chunk_id
    )
    toks = text.split(" ")  # note: '' -> [''] like F.split
    # chunk c covers tokens [c*stride, c*stride + chunk); stitching the
    # non-overlapping prefixes reproduces the token stream exactly
    rebuilt: list[str] = []
    prev_end = 0
    for r in rows:
        got = r.chunk_text.split(" ") if r.chunk_text != "" else [""] if r.chunk_len else []
        assert got == toks[r.chunk_id * stride : r.chunk_id * stride + chunk]
        # no chunk is fully contained in its predecessor: each must extend
        # coverage past the previous chunk's end (duplicate-tail guard)
        end = r.chunk_id * stride + len(got)
        assert r.chunk_id == 0 or end > prev_end
        prev_end = end
        rebuilt.extend(got[:stride] if r is not rows[-1] else got)
    assert rebuilt == toks


@given(
    sizes=st.lists(st.integers(0, 99), min_size=0, max_size=30),
    target=st.integers(50, 200),
)
@SET
def test_compaction_groups_match_greedy_reference(spark, sizes, target):
    rows = [(1, "p", f"f{i:03d}", 1, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(
        rows,
        "snapshot_id int, part_key string, file_path string, "
        "record_count long, file_size_in_bytes long",
    )
    got = {
        (g.group_id, g.n_files, g.group_bytes)
        for g in ops.compaction_plan(df, target_bytes=target, small_threshold=100)
        .collect()
    }
    # python greedy reference; kernel orders by (file_path, size, records),
    # which equals the original index order here (paths f000, f001, ...)
    expect: dict[int, list[int]] = {}
    off = 0
    for i, s in enumerate(sizes):
        gid = off // target
        expect.setdefault(gid, []).append(s)
        off += s
    want = {(g, len(v), sum(v)) for g, v in expect.items()}
    assert got == want


@given(bits=st.integers(1, 5))
@SET
def test_hilbert_bijection_and_adjacency_any_order(spark, bits):
    """For every curve order 1..5: hilbert_index is a bijection onto
    [0, 4^bits) and consecutive codes are grid-adjacent — the invariants
    that make equal-width code buckets spatially tight at ANY grid size."""
    from iceberg_meta_spark.operators.maintenance import hilbert_index

    n = 1 << bits
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    pos = {r.hvalue: (r.x, r.y) for r in hilbert_index(cells, bits).collect()}
    assert sorted(pos) == list(range(n * n))
    assert all(
        abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


@given(
    old=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 9), st.integers(0, 50)),
        max_size=20,
    ),
    new=st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(0, 9), st.integers(0, 50)),
        max_size=20,
    ),
)
@SET
def test_incremental_stats_property(spark, old, new):
    """old stats + delta == full recompute at the new snapshot, for ANY
    pair of (group, id, weight) multisets — including duplicate ids,
    vanishing groups, and brand-new groups."""
    from iceberg_meta_spark.operators.incremental import incremental_group_stats

    schema = "g string, id int, w long"
    mk = lambda rows: (
        spark.createDataFrame([(g, i, w) for g, i, w in rows], schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    out = {
        r.g: (r.n, r.w)
        for r in incremental_group_stats(mk(old), mk(new), "g", "id", ("w",)).collect()
    }
    expect: dict[str, list[int]] = {}
    for g, _, w in new:
        expect.setdefault(g, [0, 0])
        expect[g][0] += 1
        expect[g][1] += w
    for g, (n, w) in expect.items():
        assert out[g] == (n, w), (g, out.get(g), (n, w))
    # groups only in OLD must net to exactly zero
    for g in {g for g, _, _ in old} - set(expect):
        assert out[g] == (0, 0), (g, out[g])


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=3, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_leakage_safe_splits_never_straddle_fingerprint_links(spark, texts):
    # For ANY corpus: two docs sharing a 3-token prefix or suffix must land
    # in the same split (transitively). Tiny vocab forces heavy collisions.
    from iceberg_meta_spark.pipeline.graph import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    split = {r.doc_id: r.split for r in leakage_safe_splits(docs).collect()}
    assert len(split) == len(texts)

    # independent reference clustering: union-find over prefix/suffix keys
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keys: dict[str, int] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for key in ("p|" + " ".join(toks[:3]), "s|" + " ".join(toks[-3:])):
            if key in keys:
                parent[find(i)] = find(keys[key])
            else:
                keys[key] = i
    for i in range(len(texts)):
        assert split[i] == split[find(i)], (i, find(i), texts)


def _bpe_reference(texts: list[str], rounds: int) -> list[tuple[str, int, int]]:
    """Pure-Python BPE reference: (merged_pair, pair_count, symbols_after)."""
    seqs = [t.split(" ") for t in texts]
    out = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (pa, pb), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = pa + "+" + pb
        new_seqs = []
        for s in seqs:
            ns: list[str] = []
            for x in s:
                if ns and ns[-1] == pa and x == pb:
                    ns[-1] = merged
                else:
                    ns.append(x)
            new_seqs.append(ns)
        seqs = new_seqs
        out.append((merged, c, sum(len(s) for s in seqs)))
    return out


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_bpe_merges_match_python_reference(spark, texts):
    # tiny alphabet forces repeated pairs, overlaps ('a a a'), and ties —
    # the fold must agree with a direct greedy-leftmost implementation
    from iceberg_meta_spark.pipeline import bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merged_pair, r.pair_count, r.symbols_after)
        for r in bpe.bpe_merges(docs, rounds=2).orderBy("merge_round").collect()
    ]
    assert got == _bpe_reference(texts, 2), (texts, got)


class _FakeState:
    """Minimal GroupState stand-in for driver-side sketch property tests."""

    exists = False
    hasTimedOut = False

    def update(self, v):
        self.exists, self.val = True, v

    @property
    def get(self):
        return self.val

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self.exists = False


@given(
    data=st.lists(st.integers(0, 30), min_size=1, max_size=120),
    m=st.integers(2, 8),
    cuts=st.lists(st.integers(0, 119), max_size=4),
)
@SET
def test_space_saving_invariants(data, m, cuts):
    """Space-saving guarantees, any stream, any batch split: (1) every
    estimate brackets the true count (est - err <= true <= est); (2) every
    item with true frequency > N/m is tracked."""
    import pandas as pd

    from iceberg_meta_spark.streaming.heavy import _make_update

    update = _make_update(m=m, k=m, timeout_ms=1000)
    st_ = _FakeState()
    bounds = sorted({0, len(data), *[c for c in cuts if c <= len(data)]})
    out = None
    for lo, hi in zip(bounds, bounds[1:]):
        if hi > lo:
            out = pd.concat(update((0,), iter([pd.DataFrame({"user_id": data[lo:hi]})]), st_))
    true = {u: data.count(u) for u in set(data)}
    n = len(data)
    tracked = dict(zip(out.user_id, zip(out.est_count, out.err_bound)))
    for u, (est, err) in tracked.items():
        assert est - err <= true.get(int(u), 0) <= est
    for u, c in true.items():
        if c > n / m:
            assert u in tracked  # heavy hitters are never evicted for good
@given(
    vals=st.lists(st.integers(0, 10**9), min_size=1, max_size=150),
    cuts=st.lists(st.integers(0, 149), max_size=4),
)
@SET
def test_histogram_quantile_upper_bounds(vals, cuts):
    """Histogram-sketch quantiles, any stream, any batch split: each
    reported bound >= the true continuous quantile, bounds are monotone
    across probes, and the final state is split-invariant."""
    import pandas as pd

    from iceberg_meta_spark.streaming.quantiles import _update

    def run(chunks):
        s = _FakeState()
        out = None
        for ch in chunks:
            if len(ch):
                out = pd.concat(_update((0,), iter([pd.DataFrame({"cents": ch})]), s))
        return s.val, out

    bounds = sorted({0, len(vals), *[c for c in cuts if c <= len(vals)]})
    state_a, out = run([vals[lo:hi] for lo, hi in zip(bounds, bounds[1:])])
    state_b, _ = run([vals])
    assert state_a == state_b  # order/split-insensitive counters

    def true_q(q):
        srt = sorted(vals)
        pos = q * (len(srt) - 1)
        lo_i = int(pos)
        hi_i = min(lo_i + 1, len(srt) - 1)
        return srt[lo_i] + (srt[hi_i] - srt[lo_i]) * (pos - lo_i)

    row = out.iloc[0]
    assert row.p25_ub <= row.p50_ub <= row.p75_ub
    for col, q in (("p25_ub", 0.25), ("p50_ub", 0.5), ("p75_ub", 0.75)):
        assert row[col] >= true_q(q)


@given(iv=intervals)
@SET
def test_clustering_depth_matches_bruteforce(spark, iv):
    """Bucketed two-level running sum ≡ the single global sweep: max and
    mean event-point depth agree with a driver-side brute force, for any
    interval set (including shared endpoints, where all +1s apply before
    -1s — inclusive-bounds semantics)."""
    from iceberg_meta_spark import operators as ops

    rows = [(7, lo, lo + ln) for lo, ln in iv]
    events = sorted(
        [(lo, 1) for _, lo, _ in rows] + [(hi, -1) for _, _, hi in rows],
        key=lambda e: (e[0], -e[1]),
    )
    run, depths = 0, []
    for _, d in events:
        run += d
        depths.append(run)
    df = spark.createDataFrame(
        rows, "field_id int, lower_bound long, upper_bound long"
    )
    got = ops.clustering_depth(df, bucket_width=64).collect()
    if not rows:
        assert got == []
        return
    (r,) = got
    assert r.n_files == len(rows)
    assert r.max_depth == max(depths)
    assert r.avg_depth_permille == sum(depths) * 1000 // len(depths)


snapshot_times = st.lists(
    st.integers(min_value=0, max_value=120 * 86_400_000_000),
    min_size=1,
    max_size=25,
    unique=True,
)


@given(times=snapshot_times, daily=st.integers(0, 60), weekly=st.integers(0, 20))
@SET
def test_retention_keep_set_is_monotone_in_policy(spark, times, daily, weekly):
    """Widening any retention tier can only ADD kept snapshots — a policy
    loosened for safety must never newly expire something (the invariant an
    operator relies on when editing the config before an expire run)."""
    from iceberg_meta_spark.operators.maintenance import retention_policy

    snaps = spark.createDataFrame(
        [(i, t) for i, t in enumerate(sorted(times))],
        "snapshot_id long, committed_us long",
    )
    now = 121 * 86_400_000_000

    def kept(**kw):
        return {
            r.snapshot_id
            for r in retention_policy(snaps, now_us=now, **kw).collect()
            if r.keep
        }

    base = kept(keep_last=2, keep_all_hours=12, daily_days=daily, weekly_weeks=weekly)
    wider = kept(
        keep_last=4, keep_all_hours=48, daily_days=daily + 10, weekly_weeks=weekly + 5
    )
    assert base <= wider, (sorted(base - wider), times)
    assert base, "keep_last>=1 must keep at least one snapshot"
    # the newest snapshot is always kept (it is recency rank 1)
    newest_id = len(times) - 1  # ids were assigned in sorted-time order
    assert newest_id in base


@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    hot=st.integers(0, 500),
)
@SET
def test_key_skew_profile_matches_bruteforce(spark, counts, hot):
    """eff_keys / max_over_avg / top_share against the same formulas computed
    in plain Python on the histogram — any divergence is an arithmetic bug."""
    from iceberg_meta_spark.operators.skew import key_skew_profile

    hist = dict(enumerate(counts))
    if hot:
        hist[0] = hist.get(0, 0) + hot
    rows = [(f"k{k:03d}",) for k, c in hist.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "key string")
    r = key_skew_profile(df, "key").collect()[0]
    n = sum(hist.values())
    kct = len(hist)
    mx = max(hist.values())
    assert (r.n_rows, r.n_keys, r.max_cnt) == (n, kct, mx)
    assert r.max_over_avg == _spark_round(mx / (n / kct), 2)
    assert r.eff_keys == _spark_round(n * n / sum(c * c for c in hist.values()), 2)
    assert r.top_share == _spark_round(mx / n, 6)
    # the recommendation trigger is exactly the documented integer predicate
    assert (r.salt_n > 0) == (mx * kct > 8 * n)
