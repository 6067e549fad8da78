"""Deduplication over document tables, Ray-Data-first.

All variants follow the same scale shape:

  1. per-batch signature computation (stateless map_batches, no shuffle);
  2. flat_map signatures to bucket keys (band hash / prefix);
  3. ONE hash-shuffle groupby on the bucket key;
  4. in-group verification (exact compare / Jaccard / Hamming) emitting
     either survivors or near-duplicate pairs.

Hashing is md5-based and seed-free, so results are deterministic across
processes and cluster sizes.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partition + per-group first: one row per distinct text with the
    surviving (minimum) id and the duplicate count."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                "content_hash": pa.array(
                    [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
                ),
                id_col: batch.column(id_col),
            }
        )

    from deduce_ray.ops.agg import merge_shards

    n_shards = merge_shards()

    def pick_first(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("content_hash", as_index=False).agg(
            keep_id=(id_col, "min"), n_dupes=(id_col, "count")
        )
        # shard the merge shuffle: one vectorized pandas merge per shard
        # instead of one map_groups UDF call per distinct hash
        out["__shard"] = (
            out["content_hash"].str.slice(0, 4).apply(int, base=16) % n_shards
        ).astype("int64")
        return out

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    # local combiner then one shuffle on the hash shard (batch_size also
    # coalesces small upstream blocks ahead of the sort-based exchange)
    return hashed.map_batches(
        pick_first, batch_format="pandas", batch_size=65536
    ).groupby("__shard").map_groups(
        lambda df: df.drop(columns=["__shard"])
        .groupby("content_hash", as_index=False)
        .agg(keep_id=("keep_id", "min"), n_dupes=("n_dupes", "sum")),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _md5_words(texts) -> tuple[np.ndarray, np.ndarray]:
    """The module-wide exact-dedup key: md5(text or "") as two SIGNED
    int64 words (hi, lo).  Every consumer of the 128-bit content-hash
    convention (``dedup_survivors``, the incremental
    :mod:`deduce_ray.state.dedup_store`) must derive it here so the
    within-run and cross-run notions of "duplicate" can never drift."""
    n = len(texts)
    digests = [hashlib.md5((t or "").encode()).digest() for t in texts]
    hi = np.fromiter(
        (int.from_bytes(d[:8], "big", signed=True) for d in digests),
        dtype=np.int64,
        count=n,
    )
    lo = np.fromiter(
        (int.from_bytes(d[8:], "big", signed=True) for d in digests),
        dtype=np.int64,
        count=n,
    )
    return hi, lo


# per-process word -> md5-64 memo: vocabulary is tiny relative to token
# count, so this removes almost every md5 call from the shingle/simhash hot
# loops; bounded so a pathological vocabulary cannot exhaust worker heap
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 1_000_000

_SHINGLE_P = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def _word_hashes(words: list[str]) -> np.ndarray:
    cache = _WORD_HASH_CACHE
    if len(cache) > _WORD_HASH_CACHE_MAX:
        cache.clear()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = cache[w] = _stable_hash64(w)
        out[i] = h
    return out


def gram_hash_array(words: list[str], n: int) -> np.ndarray:
    """uint64 hash of each n-gram window of ``words`` (index = start
    position; empty when fewer than ``n`` words).  Word hashes are
    memoized md5; a window hash is the vectorized polynomial combine
    sum_j h[i+j] * P^(n-1-j) mod 2^64 — order-sensitive and
    deterministic, with no per-window digest calls.  The single
    positional core shared by the MinHash shingle stage and substring
    dedup (:mod:`deduce_ray.ops.substring`) so the two families can
    never drift."""
    m = len(words)
    if m < n:
        return np.empty(0, dtype=np.uint64)
    h = _word_hashes(words)
    with np.errstate(over="ignore"):
        acc = h[: m - n + 1].copy()
        for j in range(1, n):
            acc *= _SHINGLE_P
            acc += h[j : m - n + 1 + j]
    return acc


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of word k-shingles (sorted uint64 array).

    Windows shorter than ``k`` fall back to one whole-text shingle.
    Words come from the shared explicit-class splitter so the SQL
    oracles match exactly.
    """
    from deduce_ray.ops.textstats import split_words

    words = split_words(text)
    if not words:
        return np.empty(0, dtype=np.uint64)
    return np.unique(gram_hash_array(words, min(k, len(words))))


def _minhash_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    # deterministic a/b parameters derived from md5, no RNG state
    a = np.array(
        [_stable_hash64(f"minhash-a-{i}") | 1 for i in range(n_perm)],
        dtype=np.uint64,
    )
    b = np.array(
        [_stable_hash64(f"minhash-b-{i}") for i in range(n_perm)],
        dtype=np.uint64,
    )
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over (a*x + b) mod 2^64 per permutation — uint64 wraparound is a
    deterministic mixing permutation for odd a, vectorized over shingles."""
    x = np.asarray(shingles, dtype=np.uint64)
    if x.size == 0:
        return np.zeros(len(a), dtype=np.uint64)
    with np.errstate(over="ignore"):
        prod = a[:, None] * x[None, :] + b[:, None]
    return prod.min(axis=1)


def _vec_matrix(column) -> np.ndarray:
    """Zero-copy-where-possible Arrow list<float> -> (n, dim) float64
    (shared with the ANN ops)."""
    from deduce_ray.ops.similarity import _as_matrix

    return _as_matrix(column)


@functools.lru_cache(maxsize=8)
def _lsh_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """(n_tables, dim, n_planes) deterministic hyperplane stack, cached
    per worker process instead of re-drawn per batch; each table's matrix
    comes from the shared seeded factory in ops.similarity."""
    from deduce_ray.ops.similarity import _hyperplanes

    return np.stack(
        [_hyperplanes(dim, n_planes, 1000 + t) for t in range(n_tables)]
    )


def _hot_bucket_pairs(
    df: pd.DataFrame,
    key_col: str,
    id_col: str,
    max_bucket: int | None = None,
):
    """Distinct candidate pairs from bucket co-membership — the shared
    core of every in-shard LSH verification (minhash, simhash, embedding).

    Returns ``(docs, ia, ib)``: ``docs`` holds one row per distinct id
    (sorted by id, so position order == id order and emitted pairs come
    out id_a < id_b without a per-pair sort), and ``ia``/``ib`` are int64
    POSITION arrays into ``docs`` for the candidate pairs — np.triu per
    bucket (Python cost per bucket, not per pair), cross-bucket dedup via
    one np.unique.  ``(None, None, None)`` when no bucket has 2+ ids.

    Per-bucket candidates are quadratic in bucket size.  The default
    mitigation upstream is exact-dup pre-collapse (``collapse_exact`` in
    the three LSH ops), which removes the mass-duplication input shape;
    ``max_bucket`` is the residual knob for DISTINCT-text hot buckets:
    buckets larger than it contribute only their ``max_bucket``
    smallest-id members and the exact number of dropped candidate pairs
    is logged (never silent) — a recall cap, off by default so the
    oracle-checked configurations stay exact."""
    sizes = df.groupby(key_col)[id_col].nunique()
    hot = sizes[sizes > 1].index
    if not len(hot):
        return None, None, None
    sub = df[df[key_col].isin(hot)]
    docs = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
    doc_ids = docs[id_col].to_numpy(dtype=np.int64)
    pos = {int(d): p for p, d in enumerate(doc_ids)}
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    capped_buckets = 0
    dropped_pairs = 0
    mem = sub.drop_duplicates(subset=[key_col, id_col])
    for _, ids in mem.groupby(key_col)[id_col]:
        arr = np.sort(
            np.fromiter(
                (pos[int(x)] for x in ids), dtype=np.int64, count=len(ids)
            )
        )
        if max_bucket is not None and len(arr) > max_bucket:
            capped_buckets += 1
            dropped_pairs += (
                len(arr) * (len(arr) - 1) - max_bucket * (max_bucket - 1)
            ) // 2
            arr = arr[:max_bucket]  # sorted positions == smallest ids
        iu, ju = np.triu_indices(len(arr), k=1)
        ia_parts.append(arr[iu])
        ib_parts.append(arr[ju])
    if capped_buckets:
        import logging

        logging.getLogger(__name__).warning(
            "_hot_bucket_pairs: capped %d bucket(s) at max_bucket=%d, "
            "dropping %d candidate pair(s) (recall cap, not an error)",
            capped_buckets,
            max_bucket,
            dropped_pairs,
        )
    n_cand = sum(len(p) for p in ia_parts)
    if n_cand > 5_000_000:
        # observability for the ubiquitous-short-phrase shape (measured,
        # scripts/stress_funnel.py): a phrase in nearly every doc +
        # narrow bands concentrates band values, so per-shard rejected
        # candidates grow Theta(n^2) while every bucket stays BELOW
        # max_bucket.  No output change — just say where the time and
        # object-store bytes are going and which knobs bound them.
        import logging

        logging.getLogger(__name__).warning(
            "_hot_bucket_pairs: one shard generated %d candidate pairs — "
            "if most are rejected by verify, the corpus likely shares a "
            "short phrase across most documents; consider wider bands "
            "(bands=16 -> 4 rows/band), max_bucket, or strip_dup_spans",
            n_cand,
        )
    uniq = np.unique(
        np.stack(
            [np.concatenate(ia_parts), np.concatenate(ib_parts)], axis=1
        ),
        axis=0,
    )
    return docs, uniq[:, 0], uniq[:, 1]


# ---------------------------------------------------------------------------
# exact-dup pre-collapse for the LSH families
# ---------------------------------------------------------------------------
#
# Exact duplicates share EVERY band/table bucket, so a mass-duplicated text
# (1M copies of one license header — routine at 100 TB) turns one bucket
# into ~5e11 candidate pairs per band and kills the verify shard.  All
# three LSH ops therefore collapse byte-identical inputs to one
# representative (minimum id) BEFORE bucketing, run LSH on representatives
# only, and expand the verified pairs back through the dup groups at emit
# time.  The expansion is exact, not approximate: members of a group have
# identical signatures/vectors, so every member pair's similarity equals
# the representative pair's, and intra-group pairs sit at the maximum
# (jaccard 1.0 / hamming 0 / cosine 1.0), which always passes the
# threshold.  Only the EMITTED pair list is quadratic in group size — an
# output-size fact shared with any brute-force oracle — so expansion
# falls back to a connectivity-preserving star (rep, member) above
# ``expand_cap`` pairs per group, with the exact dropped count logged.


def collapse_exact_dups(ds, id_col: str, keyer, loser_broadcast_max: int = 50_000_000):
    """Collapse rows with identical 128-bit collapse keys to one
    representative (minimum id) row each.

    ``keyer(batch: pa.Table) -> (hi, lo, skip)`` returns two int64 numpy
    key words per row plus a bool "skip" mask for rows the downstream op
    would discard anyway (shingle-less / word-less / zero-norm) — skipped
    groups still lose their non-representative members (they contribute
    nothing) but emit no expansion edges.

    Returns ``(reps_ds, edges_ds)``: ``reps_ds`` is the input filtered to
    representatives via the shared sorted-chunk anti-join (only
    (hi, lo, id) ints ride the exchange — same shape as dedup_survivors),
    and ``edges_ds`` holds (rep, member) rows for every collapsed member
    of a non-skipped group, or ``None`` when the input had no exact dups
    (the common case: zero extra stages downstream)."""
    from deduce_ray.ops.agg import merge_shards

    n_shards = merge_shards()

    def hash_rows(batch: pa.Table) -> pa.Table:
        hi, lo, skip = keyer(batch)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__h_hi": pa.array(hi, type=pa.int64()),
                "__h_lo": pa.array(lo, type=pa.int64()),
                "__skip": pa.array(np.asarray(skip, dtype=bool)),
                "__shard": pa.array(hi % n_shards, type=pa.int64()),
            }
        )

    def emit_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__h_hi", "__h_lo", id_col])
        hi = df["__h_hi"].to_numpy()
        lo = df["__h_lo"].to_numpy()
        ids = df[id_col].to_numpy(dtype=np.int64)
        skip = df["__skip"].to_numpy(dtype=bool)
        n = len(df)
        new_group = np.ones(n, dtype=bool)
        if n > 1:
            new_group[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        # index of each row's group start (arange is increasing, so the
        # running max of start indices is exactly the current group start)
        rep_idx = np.maximum.accumulate(
            np.where(new_group, np.arange(n), 0)
        )
        losers = ~new_group
        # duplicate-id rows with identical text (a dataset unioned with
        # itself, planted-id collisions) would otherwise emit a self edge
        # AND put the id on the loser list — _drop_ids then erases the
        # representative row too, silently removing the document from LSH.
        # Masking self-edges keeps both rows in reps_ds, the benign
        # pre-collapse behavior (downstream pair emission dedups ids).
        losers &= ids[rep_idx] != ids
        return pd.DataFrame(
            {
                "rep": ids[rep_idx][losers],
                "member": ids[losers],
                "pair_ok": ~skip[losers],
            }
        ).astype({"rep": "int64", "member": "int64", "pair_ok": "bool"})

    edges = (
        ds.map_batches(
            hash_rows, batch_format="pyarrow", batch_size=65536, num_cpus=0.9
        )
        .groupby("__shard")
        .map_groups(emit_edges, batch_format="pandas")
        .materialize()
    )

    # every member row is a loser id; pull them in bounded sorted chunks
    # (driver peak = one chunk) exactly like dedup_survivors
    flags = {"any_pair_edges": False}

    def observe(b: pa.Table) -> None:
        if not flags["any_pair_edges"] and pc.any(b.column("pair_ok")).as_py():
            flags["any_pair_edges"] = True

    refs = _chunked_id_refs(
        edges, "member", loser_broadcast_max, on_batch=observe
    )
    any_pair_edges = flags["any_pair_edges"]
    if not refs:
        return ds, None

    reps = _drop_ids(ds, refs, id_col)
    if not any_pair_edges:
        return reps, None
    pair_edges = edges.map_batches(
        lambda t: t.filter(t.column("pair_ok")).select(["rep", "member"]),
        batch_format="pyarrow",
    )
    return reps, pair_edges


def _text_collapse_keyer(text_col: str):
    """Collapse key = md5(text); skip rows with no words (the LSH text ops
    discard them: word_shingles()/split_words() are empty for the same
    inputs, so the flag is exact for both minhash and simhash)."""
    from deduce_ray.ops.textstats import split_words

    def keyer(batch: pa.Table):
        texts = batch.column(text_col).to_pylist()
        digests = [hashlib.md5((t or "").encode()).digest() for t in texts]
        hi = np.fromiter(
            (int.from_bytes(d[:8], "big", signed=True) for d in digests),
            dtype=np.int64,
            count=len(digests),
        )
        lo = np.fromiter(
            (int.from_bytes(d[8:], "big", signed=True) for d in digests),
            dtype=np.int64,
            count=len(digests),
        )
        skip = np.fromiter(
            (not split_words(t or "") for t in texts),
            dtype=bool,
            count=len(texts),
        )
        return hi, lo, skip

    return keyer


def _vector_collapse_keyer(vec_col: str):
    """Collapse key = md5 of the float64 vector bytes; skip zero-norm rows
    (their verified cosine is 0 under the shared denom guard, never a
    pair — and collapsing them removes the all-zeros hot bucket)."""

    def keyer(batch: pa.Table):
        mat = _vec_matrix(batch.column(vec_col))
        n = mat.shape[0]
        hi = np.empty(n, dtype=np.int64)
        lo = np.empty(n, dtype=np.int64)
        for i in range(n):
            d = hashlib.md5(mat[i].tobytes()).digest()
            hi[i] = int.from_bytes(d[:8], "big", signed=True)
            lo[i] = int.from_bytes(d[8:], "big", signed=True)
        skip = ~(mat != 0).any(axis=1)
        return hi, lo, skip

    return keyer


def _expand_dup_pairs(
    rep_pairs,
    edges_ds,
    value_col: str,
    intra_value,
    value_dtype: str,
    expand_cap: int | None = None,
):
    """Expand representative-level verified pairs through exact-dup groups.

    Emits (a) intra-group pairs at ``intra_value`` for every collapsed
    group — always above threshold by construction — and (b) each rep
    pair replicated across the member sets of both endpoints (members
    share the rep's signature/vector, so the verified value transfers
    exactly).  Groups whose expansion would exceed ``expand_cap`` pairs
    degrade to a star around the representative (connectivity and
    dup-flagging preserved; exact dropped-pair count logged — an
    output-size cap, not a candidate-generation one).  Off (None) by
    default, matching ``max_bucket``: every output-changing cap is
    opt-in so the oracle-checked configurations stay exact; scale runs
    over mass-duplicated corpora should pass a cap (the stress harness
    uses 8192).

    Safe for the full signed int64 id range: the join stages carry an
    explicit ``is_edge`` discriminator column, and the -1 values in the
    unused member/other slots are plain fills, never tested.

    Two physical plans: a DRIVER fast path when the edge list and the
    intra-pair output are both small (the common corpus: a handful of
    exact dups), replacing the 3-exchange distributed expansion with one
    shuffle-free map_batches against a broadcast edge table (measured:
    ~1-2 s of pure fixed groupby overhead per LSH query at sf0.1 with 8
    edges); and the sharded distributed path for mass-duplicated inputs."""
    import ray.data

    from deduce_ray.ops.agg import merge_shards

    if edges_ds is None:
        return rep_pairs
    n_shards = merge_shards()

    def intra_pairs(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        parts: list[pd.DataFrame] = []
        dropped = 0
        for rep, grp in df.groupby("rep"):
            # unique members excluding the rep: duplicate-id input rows
            # produce repeated (rep, member) edges, which would otherwise
            # expand into self pairs (member, member)
            uniq = np.unique(grp["member"].to_numpy(dtype=np.int64))
            members = np.concatenate(
                [
                    np.asarray([rep], dtype=np.int64),
                    uniq[uniq != rep],
                ]
            )
            m = len(members)
            npairs = m * (m - 1) // 2
            if expand_cap is not None and npairs > expand_cap:
                dropped += npairs - (m - 1)
                ia = np.zeros(m - 1, dtype=np.int64)
                ib = np.arange(1, m, dtype=np.int64)
            else:
                ia, ib = np.triu_indices(m, k=1)
            parts.append(
                pd.DataFrame({"id_a": members[ia], "id_b": members[ib]})
            )
        if dropped:
            logging.getLogger(__name__).warning(
                "_expand_dup_pairs: intra-group expansion capped at "
                "expand_cap=%d; emitted star pairs instead, dropping %d "
                "pair(s) (all at the intra value — connectivity preserved)",
                expand_cap,
                dropped,
            )
        out = pd.concat(parts, ignore_index=True)
        out[value_col] = intra_value
        return out.astype(
            {"id_a": "int64", "id_b": "int64", value_col: value_dtype}
        )

    # ----- driver fast path: small edge set AND bounded intra output.
    # edges_ds is materialized by collapse_exact_dups, so count() is free.
    n_edges = edges_ds.count()
    if n_edges <= 1_000_000:
        import ray

        frames = [
            b.to_pandas()
            for b in edges_ds.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        edges_df = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"rep": [], "member": []})
        ).drop_duplicates()
        edges_df = edges_df[edges_df["rep"] != edges_df["member"]]
        sizes = edges_df.groupby("rep").size() if len(edges_df) else pd.Series(dtype="int64")
        m_plus = sizes + 1
        full = (m_plus * (m_plus - 1)) // 2
        if expand_cap is not None:
            intra_total = int(np.where(full > expand_cap, m_plus - 1, full).sum())
        else:
            intra_total = int(full.sum())
        if intra_total <= 5_000_000:
            intra_df = intra_pairs(edges_df) if len(edges_df) else pd.DataFrame(
                {"id_a": [], "id_b": [], value_col: []}
            )
            intra_tbl = pa.table(
                {
                    "id_a": pa.array(
                        intra_df["id_a"].to_numpy(dtype=np.int64), type=pa.int64()
                    ),
                    "id_b": pa.array(
                        intra_df["id_b"].to_numpy(dtype=np.int64), type=pa.int64()
                    ),
                    value_col: pa.array(
                        intra_df[value_col].to_numpy(dtype=value_dtype)
                    ),
                }
            )
            exp = edges_df
            if expand_cap is not None and len(sizes):
                big = sizes[m_plus > expand_cap]
                if len(big):
                    import logging

                    logging.getLogger(__name__).warning(
                        "_expand_dup_pairs (driver path): cross expansion "
                        "capped at expand_cap=%d members/side for %d "
                        "group(s) (rep-level pairs kept; intra stars keep "
                        "every member connected)",
                        expand_cap,
                        len(big),
                    )
                    exp = exp[~exp["rep"].isin(big.index)]
            exp_ref = ray.put(exp.reset_index(drop=True))

            def expand_batch(df: pd.DataFrame) -> pa.Table:
                e = ray.get(exp_ref)
                cols = list(df.columns)
                out = df
                if len(e) and len(df):
                    a = df.merge(e, left_on="id_a", right_on="rep")
                    if len(a):
                        a["id_a"] = a["member"]
                    s1 = pd.concat([df, a[cols]], ignore_index=True)
                    b = s1.merge(e, left_on="id_b", right_on="rep")
                    if len(b):
                        b["id_b"] = b["member"]
                    out = pd.concat([s1, b[cols]], ignore_index=True)
                # same ordering rule as the distributed finish step:
                # member ids interleave across groups, restore id_a < id_b
                ia = out["id_a"].to_numpy(dtype=np.int64)
                ib = out["id_b"].to_numpy(dtype=np.int64)
                return pa.table(
                    {
                        "id_a": pa.array(np.minimum(ia, ib), type=pa.int64()),
                        "id_b": pa.array(np.maximum(ia, ib), type=pa.int64()),
                        value_col: pa.array(
                            out[value_col].to_numpy(dtype=value_dtype)
                        ),
                    }
                )

            cross_fast = rep_pairs.map_batches(
                expand_batch, batch_format="pandas"
            )
            return cross_fast.union(ray.data.from_arrow(intra_tbl))

    def _add_rep_shard(t: pa.Table) -> pa.Table:
        rep = t.column("rep").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__shard", pa.array(rep % n_shards, type=pa.int64())
        )

    edge_shard = edges_ds.map_batches(_add_rep_shard, batch_format="pyarrow")
    # emit ARROW blocks: this dataset is unioned with the arrow-block
    # `cross` below, and a union of pandas + arrow blocks crashes any
    # downstream iter_batches whose batch window spans the type boundary
    # (ray.data DelegatingBlockBuilder asserts one block type per batch)
    intra = edge_shard.groupby("__shard").map_groups(
        lambda df: pa.Table.from_pandas(
            intra_pairs(df.drop(columns=["__shard"])), preserve_index=False
        ),
        batch_format="pandas",
    )

    def _tag_edges(t: pa.Table) -> pa.Table:
        rep = t.column("rep").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        return pa.table(
            {
                "__shard": pa.array(rep % n_shards, type=pa.int64()),
                "rep": pa.array(rep, type=pa.int64()),
                "member": pc.cast(t.column("member"), pa.int64()),
                "other": pa.array(np.full(n, -1), type=pa.int64()),
                "value": pa.array(np.zeros(n), type=pa.float64()),
                "is_edge": pa.array(np.ones(n, dtype=bool)),
            }
        )

    edge_tagged = edges_ds.map_batches(_tag_edges, batch_format="pyarrow")

    def _tag_pairs(side: str, other: str):
        def tag(t: pa.Table) -> pa.Table:
            rep = (
                t.column(side)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            n = t.num_rows
            return pa.table(
                {
                    "__shard": pa.array(rep % n_shards, type=pa.int64()),
                    "rep": pa.array(rep, type=pa.int64()),
                    "member": pa.array(np.full(n, -1), type=pa.int64()),
                    "other": pc.cast(t.column(other), pa.int64()),
                    "value": pc.cast(t.column(value_col), pa.float64()),
                    "is_edge": pa.array(np.zeros(n, dtype=bool)),
                }
            )

        return tag

    def side_expand(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        # drop_duplicates: duplicate-id input rows yield repeated
        # (rep, member) edges, which would replicate each cross pair
        edges = df[df["is_edge"]][["rep", "member"]].drop_duplicates()
        prs = df[~df["is_edge"]][["rep", "other", "value"]]
        empty = pd.DataFrame(
            {
                "mem": pd.Series(dtype="int64"),
                "other": pd.Series(dtype="int64"),
                "value": pd.Series(dtype="float64"),
            }
        )
        if prs.empty:
            return empty
        base = prs.rename(columns={"rep": "mem"})[["mem", "other", "value"]]
        if edges.empty:
            return base.astype({"mem": "int64", "other": "int64"})
        if expand_cap is not None:
            cnt = edges.groupby("rep").size()
            big = cnt[cnt + 1 > expand_cap]
            if len(big):
                pair_cnt = prs.groupby("rep").size()
                dropped = int(
                    sum(
                        int(c) * int(pair_cnt.get(rep, 0))
                        for rep, c in big.items()
                    )
                )
                if dropped:
                    logging.getLogger(__name__).warning(
                        "_expand_dup_pairs: cross-group expansion capped at "
                        "expand_cap=%d members/side; %d expanded pair(s) "
                        "dropped (rep-level pair kept; intra stars keep "
                        "every member connected)",
                        expand_cap,
                        dropped,
                    )
                edges = edges[~edges["rep"].isin(big.index)]
        j = prs.merge(edges, on="rep")
        j = j[["member", "other", "value"]].rename(columns={"member": "mem"})
        out = pd.concat([base, j], ignore_index=True)
        return out.astype({"mem": "int64", "other": "int64"})

    # side A: replicate each pair across members of id_a's group
    stage_a = (
        edge_tagged.union(
            rep_pairs.map_batches(
                _tag_pairs("id_a", "id_b"), batch_format="pyarrow"
            )
        )
        .groupby("__shard")
        .map_groups(
            lambda df: side_expand(df.drop(columns=["__shard"])),
            batch_format="pandas",
        )
    )

    # side B: same over id_b — rename so the shared tagger applies
    def _stage_a_as_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t.column("mem"),
                "id_b": t.column("other"),
                value_col: t.column("value"),
            }
        )

    stage_b = (
        edge_tagged.union(
            stage_a.map_batches(
                _stage_a_as_pairs, batch_format="pyarrow"
            ).map_batches(_tag_pairs("id_b", "id_a"), batch_format="pyarrow")
        )
        .groupby("__shard")
        .map_groups(
            lambda df: side_expand(df.drop(columns=["__shard"])),
            batch_format="pandas",
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        # stage_b rows are (mem = expanded id_b member, other = expanded
        # id_a member); restore id_a < id_b (member ids can interleave
        # across groups) and the value column's dtype
        a = t.column("other").to_numpy(zero_copy_only=False)
        b = t.column("mem").to_numpy(zero_copy_only=False)
        lo_ = np.minimum(a, b)
        hi_ = np.maximum(a, b)
        val = t.column("value")
        if value_dtype == "int64":
            val = pc.cast(pc.round(val), pa.int64())
        return pa.table(
            {
                "id_a": pa.array(lo_, type=pa.int64()),
                "id_b": pa.array(hi_, type=pa.int64()),
                value_col: val,
            }
        )

    cross = stage_b.map_batches(finish, batch_format="pyarrow")
    return cross.union(intra)


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def _dedup_pairs(
    pairs_ds,
    value_col: str,
    n_shards: int | None = None,
    driver_max: int = 2_000_000,
    value_dtype: str = "float64",
):
    """Distinct on (id_a, id_b).  The verification value is deterministic
    per pair, so either copy of a pair found via different shards is
    interchangeable.

    Verified pair sets are tiny relative to the corpus, so the common
    path materializes the pairs once and, up to ``driver_max`` rows,
    dedupes on the driver — a BOUNDED materialization (same precedent as
    neardup_clusters' union-find path) that saves the second all-to-all
    sort the shard-groupby path costs.  Above the bound: shard by a hash
    of the pair, drop duplicates vectorized inside each shard task."""
    import ray.data

    from deduce_ray.ops.agg import merge_shards

    if n_shards is None:
        n_shards = merge_shards()
    pairs_ds = pairs_ds.materialize()
    if driver_max and pairs_ds.count() <= driver_max:
        # build from iter_batches rather than bare to_pandas(): the bound
        # is the count check above, made explicit and version-proof
        # (some Ray versions enforce a default to_pandas row limit)
        frames = [
            b.to_pandas()
            for b in pairs_ds.iter_batches(batch_format="pyarrow")
        ]
        frames = [f for f in frames if len(f)]
        df = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame()
        )
        if "id_a" not in df.columns:
            # empty dataset -> zero-column DataFrame; return a typed empty
            # result instead of crashing drop_duplicates
            df = pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    value_col: pd.Series(dtype=value_dtype),
                }
            )
        out = (
            df.drop_duplicates(subset=["id_a", "id_b"])[
                ["id_a", "id_b", value_col]
            ]
            .astype({"id_a": "int64", "id_b": "int64"})
            .reset_index(drop=True)
        )
        return ray.data.from_pandas(out)

    def add_shard(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        shard = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % n_shards).astype(
            np.int32
        )
        return batch.append_column("pair_shard", pa.array(shard))

    def drop_dupes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])[
            ["id_a", "id_b", value_col]
        ]

    return (
        pairs_ds.map_batches(add_shard, batch_format="pyarrow", batch_size=65536)
        .groupby("pair_shard")
        .map_groups(drop_dupes, batch_format="pandas")
    )


_BAND_P1 = np.uint64(0x9E3779B97F4A7C15)
_BAND_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _minhash_sig_matrix(texts, ids_in, k, n_perm, a, b):
    """(kept_ids, sig_rows) for the docs with at least one word.

    Batched signatures (ROADMAP #6): ONE affine transform + per-doc
    segmented min per chunk of docs, instead of an (n_perm x n_shingles)
    product per document; chunks bound the intermediate at ~64 MB.
    Shingle-less (empty/whitespace-only) docs are dropped: they all share
    the zero signature, so emitting them would put every such doc in one
    bucket (O(m^2) verify, all "jaccard 1.0") — they are exact duplicates
    of each other and belong to exact_dedup."""
    sh_list: list[np.ndarray] = []
    kept: list[int] = []
    for i, t in zip(ids_in, texts):
        sh = word_shingles(t or "", k)
        if sh.size == 0:
            continue
        sh_list.append(sh)
        kept.append(i)
    if not kept:
        return (
            np.empty(0, dtype=np.int64),
            np.empty((0, n_perm), dtype=np.uint64),
            [],
        )
    n_docs = len(kept)
    sig_rows = np.empty((n_docs, n_perm), dtype=np.uint64)
    max_chunk_shingles = max(1, 8_000_000 // n_perm)
    start = 0
    while start < n_docs:
        end, total = start, 0
        while end < n_docs and (
            end == start or total + sh_list[end].size <= max_chunk_shingles
        ):
            total += sh_list[end].size
            end += 1
        chunk = sh_list[start:end]
        lens = np.fromiter(
            (s.size for s in chunk), dtype=np.int64, count=len(chunk)
        )
        offsets = np.zeros(len(chunk), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        allsh = np.concatenate(chunk)
        with np.errstate(over="ignore"):
            prod = a[:, None] * allsh[None, :] + b[:, None]
        sig_rows[start:end] = np.minimum.reduceat(prod, offsets, axis=1).T
        start = end
    return np.asarray(kept, dtype=np.int64), sig_rows, sh_list


def _minhash_band_buckets(sig_rows, bands, rows_per_band):
    """(bands, n_docs) int64 bucket keys: polynomial combine of each
    band's signature rows with the band index mixed in — int64 keys
    (faster groupby than hex strings), and equal band slices still map to
    equal buckets so LSH recall is unchanged; a cross-band collision only
    ADDS a candidate that verification removes (~2^-64 per pair)."""
    n_docs = sig_rows.shape[0]
    bucket_rows = np.empty((bands, n_docs), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for band in range(bands):
            seg = sig_rows[:, band * rows_per_band : (band + 1) * rows_per_band]
            acc = seg[:, 0].copy()
            for j in range(1, rows_per_band):
                acc *= _BAND_P1
                acc += seg[:, j]
            acc += np.uint64(band) * _BAND_P1
            acc *= _BAND_P2
            bucket_rows[band] = acc
    return bucket_rows


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 32,
    threshold: float = 0.6,
    verify: str = "signature",
    collapse_exact: bool = True,
    expand_cap: int | None = None,
    max_bucket: int | None = None,
    broadcast_candidate_ids_max: int = 5_000_000,
    driver_verify_max: int = 100_000,
):
    """MinHash+LSH near-duplicate pairs.

    ``collapse_exact`` (default on) collapses byte-identical texts to one
    representative before bucketing and expands pairs back through the
    dup groups at emit — exact-equivalent output (identical texts have
    identical signatures) but per-bucket candidates stay bounded under
    mass duplication (1M copies of a license header no longer form an
    O(m^2) bucket).  ``expand_cap`` optionally bounds the EMITTED pairs
    per dup group (star fallback, logged); ``max_bucket`` optionally
    caps distinct-text bucket membership (recall cap, logged).  Both
    output-changing caps are OFF by default so the oracle-checked
    configurations stay exact; runs over mass-duplicated corpora should
    set expand_cap (the stress harness uses 8192 — collapse keeps the
    candidate stage bounded either way, the cap only bounds the
    quadratic OUTPUT).

    Default banding 32x2 puts the S-curve knee near J~0.2, so candidate
    recall at J>=0.5 is effectively 1; the in-bucket verification check
    removes the extra candidates.  Corollary at scale (measured,
    scripts/stress_funnel.py): with only r=2 rows per band, a short
    phrase shared by a constant fraction of ALL documents (ubiquitous
    boilerplate below strip_dup_spans' n-gram window, e.g. a 3-word
    footer) concentrates band values — each perm's min lands on the
    shared shingle with p ~ 1/shingles_per_doc, so bucket sizes grow
    Theta(n) and the rejected-candidate stage Theta(n^2) (5M candidates
    at 96k short docs; ~24 GB of object spill at 700k).  ``max_bucket``
    bounds it once buckets exceed the cap; below the cap, prefer more
    rows per band (``bands=16`` -> r=4 moves the knee to J~0.45 and
    drives the shared-min probability to p^4) for corpora with
    ubiquitous short phrases.

    shingle -> minhash -> band -> bucket groupby -> in-bucket verify.

    ``verify`` picks the verification strategy:

    - ``"signature"`` (default, the scale path): the bucket shuffle ships
      20-byte (shard, bucket, id) rows ONLY; signatures live in one
      materialized side table (8*n_perm bytes per doc, once) and ride the
      verify step once per touched id (bounded driver fast path, the
      common case) or once per pair side (sharded join fallback) — never
      once per band row.  The check thresholds on the signature-agreement
      estimate of Jaccard (|sig_a == sig_b| / n_perm, unbiased,
      resolution 1/n_perm).  Safe for the full signed int64 id range:
      the join fallback discriminates its legs with an explicit ``kind``
      column (same convention as embedding_neardup_pairs).
    - ``"exact"`` (validation mode for small sf): shingle sets ride the
      bucket shuffle and the check computes exact Jaccard.  Payload is
      O(doc length) and multiplied by ``bands`` in the exchange — do not
      use at scale.
    """
    if verify not in ("signature", "exact"):
        raise ValueError(f"unknown verify mode {verify!r}")
    if bands <= 0 or n_perm % bands != 0:
        # silently banding with n_perm//bands rows would drop trailing
        # permutations and change the documented S-curve; fail fast on the
        # driver instead of deep inside a Ray task
        raise ValueError(
            f"bands ({bands}) must evenly divide n_perm ({n_perm})"
        )
    rows_per_band = n_perm // bands
    a, b = _minhash_params(n_perm)
    dup_edges = None
    if collapse_exact:
        ds, dup_edges = collapse_exact_dups(
            ds, id_col, _text_collapse_keyer(text_col)
        )
    from deduce_ray.ops.agg import merge_shards

    n_shards = merge_shards()  # shuffle key granularity: most band-buckets
    # are global singletons, so grouping directly by bucket would launch
    # one task per bucket; sharding keeps it to <= n_shards group tasks,
    # with the per-bucket work vectorized in pandas inside each shard.
    exact = verify == "exact"

    if exact:
        # ----- exact mode (sf-small validation): shingle payload rides the
        # bucket shuffle; O(doc length) x bands exchange, do not use at
        # scale -----
        def signatures(batch: pa.Table) -> pa.Table:
            ids_in = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            ids_arr, sig_rows, sh_list = _minhash_sig_matrix(
                texts, ids_in, k, n_perm, a, b
            )
            payload_type = pa.list_(pa.uint64())
            if not len(ids_arr):
                return pa.table(
                    {
                        "shard": pa.array([], type=pa.int32()),
                        "bucket": pa.array([], type=pa.int64()),
                        id_col: pa.array([], type=pa.int64()),
                        "payload": pa.array([], type=payload_type),
                    }
                )
            buckets_flat = _minhash_band_buckets(
                sig_rows, bands, rows_per_band
            ).reshape(-1)
            doc_payloads = [s.tolist() for s in sh_list]
            return pa.table(
                {
                    "shard": pa.array(
                        (buckets_flat % n_shards).astype(np.int32),
                        type=pa.int32(),
                    ),
                    "bucket": pa.array(
                        buckets_flat.view(np.int64), type=pa.int64()
                    ),
                    id_col: pa.array(np.tile(ids_arr, bands), type=pa.int64()),
                    "payload": pa.array(doc_payloads * bands, type=payload_type),
                }
            )

        def verify_shard(df: pd.DataFrame) -> pd.DataFrame:
            """Vectorized in-shard verification: one payload row per
            distinct doc, candidate-pair positions gathered per bucket
            (np.triu per bucket, Python cost per BUCKET not per pair),
            pairs deduped with one np.unique, exact Jaccard per pair."""
            empty = pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
            docs, ia, ib = _hot_bucket_pairs(df, "bucket", id_col, max_bucket)
            if docs is None:
                return empty
            doc_ids = docs[id_col].to_numpy(dtype=np.int64)
            payloads = docs["payload"].tolist()
            sims = np.fromiter(
                (
                    jaccard(
                        set(int(x) for x in payloads[i]),
                        set(int(x) for x in payloads[j]),
                    )
                    for i, j in zip(ia, ib)
                ),
                dtype=np.float64,
                count=len(ia),
            )
            keep = sims >= threshold  # threshold on the unrounded value
            if not keep.any():
                return empty
            return pd.DataFrame(
                {
                    "id_a": doc_ids[ia[keep]],
                    "id_b": doc_ids[ib[keep]],
                    "jaccard": np.round(sims[keep], 6),
                }
            )

        sigs = ds.map_batches(signatures, batch_format="pyarrow")
        pairs = sigs.groupby("shard").map_groups(
            verify_shard, batch_format="pandas"
        )
        # drop duplicate pairs found via buckets in different shards
        rep_pairs = _dedup_pairs(pairs, "jaccard", n_shards)
        return _expand_dup_pairs(
            rep_pairs, dup_edges, "jaccard", 1.0, "float64", expand_cap
        )

    # ----- signature mode (the scale path): signature-only bucket shuffle,
    # mirroring embedding_neardup_pairs.  Band rows carry (shard, bucket,
    # id) at 20 bytes regardless of n_perm; the 8*n_perm-byte signatures
    # live in ONE materialized side table and ride the verify step once
    # per touched id (bounded driver fast path) or once per pair side
    # (sharded join fallback) — never once per band row.  The previous
    # design shipped the full signature `bands` times through the sort
    # exchange (~16 KB/doc at the defaults, ~33 GB at 2M docs), which
    # dominated the adversarial stress wall-time. -----
    import logging

    import ray
    import ray.data

    def sig_table(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        ids_arr, sig_rows, _ = _minhash_sig_matrix(
            texts, ids_in, k, n_perm, a, b
        )
        return pa.table(
            {
                "id": pa.array(ids_arr, type=pa.int64()),
                "sig": pa.array(
                    [sig_rows[d].tobytes() for d in range(len(ids_arr))],
                    type=pa.binary(),
                ),
            }
        )

    # materialized: consumed twice (band rows + verify fetch), and the
    # shingling/minhash pass is the expensive part worth caching
    sig_tbl = ds.map_batches(sig_table, batch_format="pyarrow").materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "shard": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    "id": pa.array([], type=pa.int64()),
                }
            )
        sig_rows = np.vstack(
            [
                np.frombuffer(s, dtype=np.uint64)
                for s in batch.column("sig").to_pylist()
            ]
        )
        ids_arr = batch.column("id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        buckets_flat = _minhash_band_buckets(
            sig_rows, bands, rows_per_band
        ).reshape(-1)
        return pa.table(
            {
                "shard": pa.array(
                    (buckets_flat % n_shards).astype(np.int32), type=pa.int32()
                ),
                "bucket": pa.array(buckets_flat.view(np.int64), type=pa.int64()),
                "id": pa.array(np.tile(ids_arr, bands), type=pa.int64()),
            }
        )

    def candidate_pairs(df: pd.DataFrame) -> pd.DataFrame:
        docs, ia, ib = _hot_bucket_pairs(df, "bucket", "id", max_bucket)
        if docs is None:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                }
            )
        ids = docs["id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = (
        sig_tbl.map_batches(band_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(candidate_pairs, batch_format="pandas")
        .materialize()
    )

    def _empty_pairs():
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        )

    def _sig_agreement(mat, ia, ib):
        """Chunked signature-agreement similarity: mat[ia]/mat[ib] would
        materialize two (n_pairs, n_perm) uint64 copies (~5 GB at 5M
        pairs x 64 perms); 65536-pair chunks bound the working set."""
        sims = np.empty(len(ia), dtype=np.float64)
        chunk = 65536
        for lo in range(0, len(ia), chunk):
            hi = min(lo + chunk, len(ia))
            sims[lo:hi] = (mat[ia[lo:hi]] == mat[ib[lo:hi]]).mean(axis=1)
        return sims

    n_pairs = cand.count()
    if n_pairs == 0:
        # nothing to verify: skip the fetch entirely (without this, the
        # id-shard leg would ship EVERY signature for a guaranteed-empty
        # result — the exact exchange the signature-only design avoids)
        return _expand_dup_pairs(
            _empty_pairs(), dup_edges, "jaccard", 1.0, "float64", expand_cap
        )

    touched_ref = None
    if 0 < n_pairs <= broadcast_candidate_ids_max:
        # candidate_pairs dedupes within a shard only; the same pair found
        # via buckets in DIFFERENT shards appears once per shard
        frames = [
            bt.to_pandas()
            for bt in cand.iter_batches(batch_format="pyarrow")
            if bt.num_rows
        ]
        cand_df = pd.concat(frames, ignore_index=True).drop_duplicates(
            subset=["id_a", "id_b"]
        )
        touched = np.unique(
            np.concatenate(
                [cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()]
            )
        )
        touched_ref = ray.put(pa.array(touched, type=pa.int64()))
        logging.getLogger(__name__).info(
            "minhash_lsh_pairs: %d candidate pairs over %d touched docs; "
            "verify ships only those signatures",
            n_pairs,
            len(touched),
        )

        if len(touched) <= driver_verify_max:
            # sparse-candidate fast path (the common case: near-dups are
            # rare relative to the corpus): collect ONLY the touched
            # signatures to the driver — a bounded materialization, like
            # the union-find path in neardup_clusters — and verify all
            # pairs vectorized, skipping both join shuffles entirely
            def touched_sigs(batch: pa.Table) -> pa.Table:
                keep = pc.is_in(
                    batch.column("id"), value_set=ray.get(touched_ref)
                )
                return batch.filter(keep)

            sig_frames = [
                bt.to_pandas()
                for bt in sig_tbl.map_batches(
                    touched_sigs, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
                if bt.num_rows
            ]
            sig_df = pd.concat(sig_frames, ignore_index=True).drop_duplicates(
                subset=["id"]
            )
            mat = np.vstack(
                [np.frombuffer(s, dtype=np.uint64) for s in sig_df["sig"]]
            )
            index = {int(i): p for p, i in enumerate(sig_df["id"])}
            ia = np.fromiter(
                (index[int(x)] for x in cand_df["id_a"]),
                dtype=np.int64,
                count=len(cand_df),
            )
            ib = np.fromiter(
                (index[int(x)] for x in cand_df["id_b"]),
                dtype=np.int64,
                count=len(cand_df),
            )
            sims = _sig_agreement(mat, ia, ib)
            keep_pairs = sims >= threshold  # unrounded threshold
            out = pd.DataFrame(
                {
                    "id_a": cand_df["id_a"].to_numpy(dtype=np.int64)[
                        keep_pairs
                    ],
                    "id_b": cand_df["id_b"].to_numpy(dtype=np.int64)[
                        keep_pairs
                    ],
                    "jaccard": np.round(sims[keep_pairs], 6),
                }
            ).astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})
            return _expand_dup_pairs(
                ray.data.from_pandas(out),
                dup_edges,
                "jaccard",
                1.0,
                "float64",
                expand_cap,
            )

    # verify join, leg 1: requests (one row per pair side) + signatures,
    # co-sharded on id.  An explicit int8 ``kind`` column (0 = request,
    # 1 = signature) discriminates the legs — a negative-id_a sentinel
    # would misclassify real negative ids (hash-derived doc ids are
    # signed int64, so half of them ARE negative).  id_a/id_b on the
    # signature leg are plain -1 FILL values, never tested: Ray's
    # arrow->pandas conversion widens nullable int64 to float64 (rounds
    # 63-bit ids), so nulls are not an option.
    def requests(batch: pa.Table) -> pa.Table:
        a_ = batch.column("id_a").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        b_ = batch.column("id_b").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        join_id = np.concatenate([a_, b_])
        return pa.table(
            {
                "id_shard": pa.array(join_id % n_shards, type=pa.int64()),
                "join_id": pa.array(join_id, type=pa.int64()),
                "id_a": pa.array(np.concatenate([a_, a_]), type=pa.int64()),
                "id_b": pa.array(np.concatenate([b_, b_]), type=pa.int64()),
                "kind": pa.array(
                    np.zeros(2 * len(a_), dtype=np.int8), type=pa.int8()
                ),
                "sig": pa.nulls(2 * len(a_), type=pa.binary()),
            }
        )

    def sig_rows_leg(batch: pa.Table) -> pa.Table:
        ids = batch.column("id")
        sigs_col = batch.column("sig")
        if touched_ref is not None:
            keep = pc.is_in(ids, value_set=ray.get(touched_ref))
            batch = batch.filter(keep)
            ids = batch.column("id")
            sigs_col = batch.column("sig")
        n = batch.num_rows
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id_shard": pa.array(ids_np % n_shards, type=pa.int64()),
                "join_id": pa.array(ids_np, type=pa.int64()),
                "id_a": pa.array(np.full(n, -1), type=pa.int64()),
                "id_b": pa.array(np.full(n, -1), type=pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8), type=pa.int8()),
                "sig": sigs_col,
            }
        )

    tagged = cand.map_batches(requests, batch_format="pyarrow").union(
        sig_tbl.map_batches(sig_rows_leg, batch_format="pyarrow")
    )

    def attach_sigs(df: pd.DataFrame) -> pd.DataFrame:
        have = df[df["kind"] == 1][["join_id", "sig"]].drop_duplicates(
            subset=["join_id"]
        )
        reqs = df[df["kind"] == 0][["join_id", "id_a", "id_b"]]
        out = reqs.merge(have, on="join_id")[
            ["id_a", "id_b", "join_id", "sig"]
        ]
        out = out.astype({"id_a": "int64", "id_b": "int64", "join_id": "int64"})
        out["pair_shard"] = (
            (
                out["id_a"].to_numpy().astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                ^ out["id_b"].to_numpy().astype(np.uint64)
            )
            % n_shards
        ).astype("int64")
        return out

    def verify_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sides_a = df[df["join_id"] == df["id_a"]].drop_duplicates(
            subset=["id_a", "id_b"]
        )
        sides_b = df[df["join_id"] == df["id_b"]].drop_duplicates(
            subset=["id_a", "id_b"]
        )
        merged = sides_a.merge(
            sides_b, on=["id_a", "id_b"], suffixes=("_a", "_b")
        )
        if merged.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        mat_a = np.vstack(
            [np.frombuffer(s, dtype=np.uint64) for s in merged["sig_a"]]
        )
        mat_b = np.vstack(
            [np.frombuffer(s, dtype=np.uint64) for s in merged["sig_b"]]
        )
        sims = (mat_a == mat_b).mean(axis=1)
        keep = sims >= threshold  # unrounded threshold
        out = pd.DataFrame(
            {
                "id_a": merged["id_a"].astype("int64")[keep],
                "id_b": merged["id_b"].astype("int64")[keep],
                "jaccard": np.round(sims[keep], 6),
            }
        )
        return out.reset_index(drop=True)

    joined = (
        tagged.groupby("id_shard")
        .map_groups(attach_sigs, batch_format="pandas")
        .groupby("pair_shard")
        .map_groups(
            lambda df: verify_pairs(df.drop(columns=["pair_shard"])),
            batch_format="pandas",
        )
    )
    return _expand_dup_pairs(
        joined, dup_edges, "jaccard", 1.0, "float64", expand_cap
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------


def neardup_clusters(
    pairs_ds,
    nodes_ds=None,
    rounds: int = 16,
    driver_threshold: int = 1_000_000,
):
    """Cluster near-duplicate pairs into components.

    Safe for the full signed int64 id range on BOTH paths: the
    distributed rounds discriminate witness-marker rows by ``w != 0``
    (edges always carry w = 0; every marker's w is positive), so a real
    node id of -1 is just another node.

    The upstream LSH pipeline is executed ONCE: ``pairs_ds`` is materialized
    before the size check, so the count and the subsequent passes read the
    cached blocks instead of re-running the shuffle.

    When the pair set is small (<= driver_threshold rows), collapse it with
    a driver-side union-find — near-dup pair sets are tiny relative to the
    corpus, and each distributed round costs shuffles.  Otherwise run
    alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each star op is ONE node-sharded
    groupby that rewires every node's neighbours toward its neighbourhood
    minimum, so a round costs 2 groupbys + 1 materialize (round 2's
    min-label + pointer-jumping loop cost 3 groupbys + 2 materializes per
    round).  Convergence is detected by an edge-set witness pair — two
    INDEPENDENT bounded per-edge hash sums (plus edge count) over the
    deduplicated edges, computed inside the large-star tasks and compared
    exactly on the driver: equal consecutive witness pairs mean the edge
    set is stable (a false stop needs a simultaneous collision in both
    families, ~2^-120), at which point every node neighbours its
    component minimum.  If the ``rounds`` budget is exhausted first a
    warning is logged and the current labels are returned.

    pairs_ds: rows with id_a/id_b.  nodes_ds: optional rows with doc_id for
    singleton nodes.  Returns (doc_id, cluster_id) with cluster_id = min
    doc id in the component.
    """
    import ray.data

    pairs_ds = pairs_ds.materialize()

    if driver_threshold and pairs_ds.count() <= driver_threshold:
        # pull the two id columns as numpy via iter_batches — take_all()'s
        # per-row dicts cost ~1 ms/row on pandas blocks (measured 85 s for
        # 100k pairs vs <1 s columnar)
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        for bt in pairs_ds.select_columns(["id_a", "id_b"]).iter_batches(
            batch_format="pyarrow"
        ):
            if bt.num_rows:
                a_parts.append(
                    bt.column("id_a").to_numpy(zero_copy_only=False)
                )
                b_parts.append(
                    bt.column("id_b").to_numpy(zero_copy_only=False)
                )
        pair_a = (
            np.concatenate(a_parts).astype(np.int64)
            if a_parts
            else np.empty(0, dtype=np.int64)
        )
        pair_b = (
            np.concatenate(b_parts).astype(np.int64)
            if b_parts
            else np.empty(0, dtype=np.int64)
        )
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for ia, ib in zip(pair_a.tolist(), pair_b.tolist()):
            ra, rb = find(ia), find(ib)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        if nodes_ds is not None:
            for bt in nodes_ds.select_columns(["doc_id"]).iter_batches(
                batch_format="pyarrow"
            ):
                for node in bt.column("doc_id").to_numpy(
                    zero_copy_only=False
                ).tolist():
                    find(int(node))
        out = pd.DataFrame(
            sorted((node, find(node)) for node in parent),
            columns=["doc_id", "cluster_id"],
        ).astype({"doc_id": "int64", "cluster_id": "int64"})
        return ray.data.from_pandas(out)

    from deduce_ray.ops.agg import merge_shards

    n_shards = merge_shards()
    # witness terms: per-edge 28-bit hashes keep each global int64 sum
    # exact up to ~2^35 edges; count is folded in with a small prime.  TWO
    # independent hash families ride each marker row (w and v columns) and
    # both sums must repeat for convergence — a false stop needs a
    # simultaneous collision in both (~2^-120), vs ~2^-60 for one family
    _WMASK = (1 << 28) - 1
    _WCOUNT_P = 40503
    _WCOUNT_P2 = 65371
    _WMUL = np.uint64(0x9E3779B97F4A7C15)
    _WMUL2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def to_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a").to_pylist(), dtype=np.int64)
        b = np.asarray(batch.column("id_b").to_pylist(), dtype=np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "shard": pa.array(u % n_shards, type=pa.int64()),
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
                "w": pa.array(np.zeros(len(u), dtype=np.int64)),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")

    def _node_mins(df: pd.DataFrame):
        """Per-u (u, m) with m = min(u, min N(u)) — canonical inside a
        shard task because all of u's edges share u's shard."""
        g = df.groupby("u")["v"].min()
        uu = g.index.to_numpy(dtype=np.int64)
        m = np.minimum(g.to_numpy(dtype=np.int64), uu)
        return pd.DataFrame({"u": uu, "m": m})

    def _emit(out: pd.DataFrame, markers: pd.DataFrame | None) -> pd.DataFrame:
        out = out[out["u"] != out["v"]]
        sym = pd.concat(
            [out, out.rename(columns={"u": "v", "v": "u"})], ignore_index=True
        ).drop_duplicates()
        sym = sym.astype({"u": "int64", "v": "int64"})
        sym["shard"] = (sym["u"] % n_shards).astype("int64")
        sym["w"] = 0
        sym = sym[["shard", "u", "v", "w"]]
        if markers is not None and len(markers):
            sym = pd.concat([sym, markers], ignore_index=True)
        return sym

    def large_star(df: pd.DataFrame) -> pd.DataFrame:
        # drop markers from the previous round; dedupe this shard's edges
        df = df[df["w"] == 0][["u", "v"]].drop_duplicates()
        if df.empty:
            return pd.DataFrame(columns=["shard", "u", "v", "w"]).astype(
                {"shard": "int64", "u": "int64", "v": "int64", "w": "int64"}
            )
        # witnesses over the DEDUPED input: describe the edge set entering
        # this round; emitted as one marker row (u = -1, v = witness2,
        # w = witness1) that the small-star task passes through for the
        # driver's per-round comparison
        uu = df["u"].to_numpy().astype(np.uint64)
        vv = df["v"].to_numpy().astype(np.uint64)
        h1 = ((uu * _WMUL) ^ vv) & np.uint64(_WMASK)
        h2 = ((vv * _WMUL2) ^ uu) & np.uint64(_WMASK)
        w1 = int(h1.sum(dtype=np.uint64)) + len(df) * _WCOUNT_P
        w2 = int(h2.sum(dtype=np.uint64)) + len(df) * _WCOUNT_P2
        markers = pd.DataFrame(
            [{"shard": 0, "u": -1, "v": w2, "w": w1}]
        ).astype({"shard": "int64", "u": "int64", "v": "int64", "w": "int64"})
        mins = _node_mins(df)
        j = df.merge(mins, on="u")
        sel = j[j["v"] > j["u"]]
        out = sel[["v", "m"]].rename(columns={"v": "u", "m": "v"})
        return _emit(out, markers)

    def small_star(df: pd.DataFrame) -> pd.DataFrame:
        markers = df[df["w"] != 0][["shard", "u", "v", "w"]]
        df = df[df["w"] == 0][["u", "v"]].drop_duplicates()
        if df.empty:
            return markers.reset_index(drop=True)
        mins = _node_mins(df)
        j = df.merge(mins, on="u")
        sel = j[j["v"] < j["u"]]
        out = pd.concat(
            [
                sel[["v", "m"]].rename(columns={"v": "u", "m": "v"}),
                mins.rename(columns={"u": "u", "m": "v"}),
            ],
            ignore_index=True,
        )
        return _emit(out, markers)

    def _witness_of(ds) -> tuple[int, int]:
        # marker rows are one per non-empty shard (<= n_shards); exact
        # Python-int sums of both families on the driver.  Discriminate
        # by w != 0 (edges always carry w = 0; a marker's w is >=
        # _WCOUNT_P > 0 since every marker summarizes >= 1 edge) — NOT
        # by u == -1, which a real node id can legitimately equal now
        # that negative ids are supported end-to-end; -1 in a marker's
        # u is a plain fill value
        rows = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("w"), 0)).select(
                ["v", "w"]
            ),
            batch_format="pyarrow",
        ).take_all()
        return (
            sum(r["w"] for r in rows),
            sum(r["v"] for r in rows),
        )

    prev_witness = None
    converged = False
    for _ in range(rounds):
        edges = (
            edges.groupby("shard")
            .map_groups(large_star, batch_format="pandas")
            .groupby("shard")
            .map_groups(small_star, batch_format="pandas")
            .materialize()
        )
        witness = _witness_of(edges)
        if prev_witness is not None and witness == prev_witness:
            converged = True
            break
        prev_witness = witness

    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "neardup_clusters: round budget (%d) exhausted before the "
            "star edge set stabilized; components wider than resolved may "
            "be split",
            rounds,
        )

    def _self_rows(ids: np.ndarray) -> pd.DataFrame:
        # pandas blocks: the star-round edges are pandas (map_groups
        # output) and the downstream groupby requires one block type
        return pd.DataFrame(
            {
                "shard": ids % n_shards,
                "u": ids,
                "v": ids,
                "w": np.zeros(len(ids), dtype=np.int64),
            }
        ).astype({"shard": "int64", "u": "int64", "v": "int64", "w": "int64"})

    # degenerate id_a == id_b pair rows name a node but carry no edge;
    # to_edges drops them from the star rounds, so re-inject them at
    # label time as singletons (matching the driver union-find path)
    def selfies(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        return _self_rows(a[a == b])

    label_input = edges.union(
        pairs_ds.map_batches(selfies, batch_format="pandas")
    )
    if nodes_ds is not None:

        def to_self(df: pd.DataFrame) -> pd.DataFrame:
            return _self_rows(df["doc_id"].to_numpy(dtype=np.int64))

        label_input = label_input.union(
            nodes_ds.map_batches(to_self, batch_format="pandas")
        )

    def to_labels(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["w"] == 0]
        mins = _node_mins(df)
        return mins.rename(columns={"u": "doc_id", "m": "cluster_id"})

    return label_input.groupby("shard").map_groups(
        to_labels, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _simhash_from_words(words: list[str]) -> int:
    h = _word_hashes(words).astype(">u8")
    bits = np.unpackbits(h.view(np.uint8).reshape(len(words), 8), axis=1)
    acc = bits.sum(axis=0, dtype=np.int64) * 2 - len(words)
    return int(np.packbits((acc > 0).astype(np.uint8)).view(">u8")[0])


def simhash64(text: str) -> int:
    """64-bit simhash over memoized word hashes: unpack every word's bits
    in one batched op; bit b of the result is set iff more than half the
    words have bit b set (acc = 2*popcount_col - n > 0)."""
    from deduce_ray.ops.textstats import split_words

    words = split_words(text)
    if not words:
        return int(np.packbits(np.zeros(64, dtype=np.uint8)).view(">u8")[0])
    return _simhash_from_words(words)


def sig_band_rows(
    sigs: np.ndarray, n_shards: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 4x16-bit band decomposition of 64-bit signatures — THE
    single source of the recall-critical banding arithmetic (pigeonhole:
    Hamming <= 3 pairs agree exactly on >= 1 band).  Returns band-major
    ``(shard, bucket)`` int64 arrays of length ``4 * len(sigs)``; pair
    them with ``np.tile(ids, 4)`` / ``np.tile(sigs, 4)``."""
    s = np.asarray(sigs, dtype=np.uint64)
    bands = np.arange(4, dtype=np.uint64)
    chunks = (s[None, :] >> (bands[:, None] * np.uint64(16))) & np.uint64(0xFFFF)
    bucket = (bands[:, None] * np.uint64(65536) + chunks).astype(np.int64)
    return (bucket % n_shards).ravel(), bucket.ravel()


def simhash_band_rows(
    ids, texts, n_shards: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(shard, bucket, id, sig) row arrays for the SimHash band
    decomposition (:func:`sig_band_rows`) — shared by
    :func:`simhash_pairs` and the incremental SimHash store
    (:mod:`deduce_ray.state.simhash_store`) so the two can never drift.
    Word-less documents are skipped: they all hash to 0 and would form
    one bogus hamming-0 mega-bucket."""
    from deduce_ray.ops.textstats import split_words

    kept_ids, kept_sigs = [], []
    for i, t in zip(ids, texts):
        words = split_words(t or "")
        if words:
            kept_ids.append(i)
            kept_sigs.append(_simhash_from_words(words))
    ids_arr = np.asarray(kept_ids, dtype=np.int64)
    sigs_arr = np.asarray(kept_sigs, dtype=np.uint64)
    shard, bucket = sig_band_rows(sigs_arr, n_shards)
    return shard, bucket, np.tile(ids_arr, 4), np.tile(sigs_arr, 4)


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    collapse_exact: bool = True,
    expand_cap: int | None = None,
    max_bucket: int | None = None,
):
    """SimHash near-dup pairs: 4x16-bit band bucketing guarantees recall for
    Hamming distance <= 3; in-bucket exact Hamming verification.

    ``collapse_exact`` / ``expand_cap`` / ``max_bucket`` mirror
    :func:`minhash_lsh_pairs` — identical texts collapse to one
    representative before bucketing (hamming 0 by construction) and
    verified pairs expand back through the dup groups at emit."""
    from deduce_ray.ops.agg import merge_shards

    dup_edges = None
    if collapse_exact:
        ds, dup_edges = collapse_exact_dups(
            ds, id_col, _text_collapse_keyer(text_col)
        )
    n_shards = merge_shards()

    def signatures(batch: pa.Table) -> pa.Table:
        shard, bucket, ids, sigs = simhash_band_rows(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
            n_shards,
        )
        # explicit types: an all-skipped batch (word-less docs) must not
        # emit null columns, or block schemas diverge
        return pa.table(
            {
                "shard": pa.array(shard, type=pa.int32()),
                "bucket": pa.array(bucket, type=pa.int32()),
                id_col: pa.array(ids, type=pa.int64()),
                "simhash": pa.array(sigs, type=pa.uint64()),
            }
        )

    def verify_shard(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized like minhash's verify_shard: candidate positions per
        hot bucket via np.triu_indices, one np.unique pair dedup, and all
        Hamming distances in one XOR + unpackbits pass."""
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "hamming": pd.Series(dtype="int64"),
            }
        )
        docs, ia, ib = _hot_bucket_pairs(df, "bucket", id_col, max_bucket)
        if docs is None:
            return empty
        doc_ids = docs[id_col].to_numpy(dtype=np.int64)
        hashes = docs["simhash"].to_numpy(dtype=np.uint64)
        x = hashes[ia] ^ hashes[ib]
        dist = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = dist <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": doc_ids[ia[keep]],
                "id_b": doc_ids[ib[keep]],
                "hamming": dist[keep],
            }
        )

    sigs = ds.map_batches(signatures, batch_format="pyarrow")
    pairs = sigs.groupby("shard").map_groups(verify_shard, batch_format="pandas")
    rep_pairs = _dedup_pairs(pairs, "hamming", n_shards, value_dtype="int64")
    return _expand_dup_pairs(
        rep_pairs, dup_edges, "hamming", 0, "int64", expand_cap
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def lsh_cosine_recall(cosine: float, n_planes: int, n_tables: int) -> float:
    """Expected probability that a true pair at the given cosine collides in
    at least one of ``n_tables`` sign-hash tables of ``n_planes`` planes:
    1 - (1 - p^k)^T with p = 1 - acos(c)/pi."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi
    return 1.0 - (1.0 - p**n_planes) ** n_tables


def plant_embedding_neardups(
    ds_embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    every: int = 10,
    id_offset: int = 10_000_000,
    scale: float = 1.5,
):
    """Deterministically augment an embedding table with planted
    near-duplicates: every ``every``-th vector gains a positively scaled
    copy (cosine exactly 1.0) under ``id + id_offset``.  Positive scaling
    preserves every hyperplane sign bit, so LSH recall on the planted
    pairs is exactly 1 regardless of table count — which is what makes the
    op value-checkable against a brute-force SQL oracle."""

    def augment(batch: pa.Table) -> pa.Table:
        from deduce_ray.ops.similarity import drop_invalid_vector_rows

        # NULL id/vector rows can't host a planted copy and would crash
        # the int casts below; drop them here (the downstream neardup op
        # applies the same SQL-null contract to un-augmented rows)
        batch = drop_invalid_vector_rows(batch, id_col, vec_col)
        ids = batch.column(id_col).to_pylist()
        vecs = batch.column(vec_col).to_pylist()
        add_ids, add_vecs = [], []
        for i, v in zip(ids, vecs):
            if i % every == 0:
                add_ids.append(i + id_offset)
                add_vecs.append([float(x) * scale for x in v])
        planted = pa.table(
            {
                id_col: pa.array(add_ids, type=pa.int64()),
                vec_col: pa.array(
                    add_vecs, type=pa.list_(pa.float64())
                ),
            }
        )
        base = pa.table(
            {
                id_col: pa.array([int(x) for x in ids], type=pa.int64()),
                vec_col: pa.array(
                    [[float(x) for x in v] for v in vecs],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
        return pa.concat_tables([base, planted])

    return ds_embeddings.map_batches(augment, batch_format="pyarrow")


def plant_text_dups(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    every: int = 10,
    id_offset: int = 100_000_000,
):
    """Deterministically augment a document table with planted exact
    duplicates: every ``every``-th doc gains a byte-identical copy under
    ``id + id_offset``.  Identical texts share every minhash/simhash
    signature (jaccard exactly 1.0, hamming 0), so LSH recall on the
    planted pairs is exactly 1 in ANY banding — and, with
    ``collapse_exact`` on, the planted pair is produced by the exact-dup
    collapse/expand path, making that machinery value-checkable against
    a trivial SQL oracle (the text-table analogue of
    :func:`plant_embedding_neardups`)."""

    def augment(batch: pa.Table) -> pa.Table:
        ids_np = (
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        copies = batch.filter(pa.array(ids_np % every == 0))
        planted = pa.table(
            {
                id_col: pc.add(
                    pc.cast(copies.column(id_col), pa.int64()), id_offset
                ),
                text_col: copies.column(text_col),
            }
        )
        base = pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                text_col: batch.column(text_col),
            }
        )
        return pa.concat_tables([base, planted])

    return ds.map_batches(augment, batch_format="pyarrow")


def embedding_neardup_pairs(
    ds_embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.97,
    n_planes: int = 12,
    n_tables: int = 8,
    broadcast_candidate_ids_max: int = 5_000_000,
    driver_verify_max: int = 20_000,
    collapse_exact: bool = True,
    expand_cap: int | None = None,
    max_bucket: int | None = None,
):
    """Cosine near-duplicates via multi-table random-hyperplane LSH with
    exact verification through a JOIN back to a single vector table.

    ``collapse_exact`` / ``expand_cap`` / ``max_bucket`` mirror
    :func:`minhash_lsh_pairs`: byte-identical vectors collapse to one
    representative before bucketing (cosine exactly 1.0 by construction;
    zero-norm duplicates are dropped, matching the verify guard that
    never pairs them) and verified pairs expand back through the dup
    groups at emit.

    A single k-plane table finds a true pair at cosine c with probability
    only p^k (p = 1 - acos(c)/pi), e.g. ~0.38 at c=0.97 for k=12.
    ``n_tables`` independent tables raise that to 1-(1-p^k)^T
    (:func:`lsh_cosine_recall`; ~0.978 at c=0.97 with the defaults).
    Pairs at cosine exactly 1.0 (scaled copies) share every sign bit, so
    their recall is 1 in every table.

    Scale shape (round-2 fix: the old in-bucket verify shipped the FULL
    vector ``n_tables`` times through the bucket shuffle — the dominant
    exchange cost at embedding scale):

    1. signature pass emits (shard, bucket, id) only — 20 bytes/row
       regardless of vector width;
    2. one bucket-shard groupby yields DISTINCT candidate pairs;
    3. candidate ids are collected (bounded: near-dup candidates are
       sparse; above ``broadcast_candidate_ids_max`` pairs the id filter
       is skipped and every vector ships once) and broadcast via ray.put
       so only TOUCHED vectors enter the verify join;
    4. when <= ``driver_verify_max`` vectors are touched (the common
       case: near-dups are sparse), the touched vectors are collected to
       the driver — a BOUNDED materialization, like neardup_clusters'
       union-find path — and every pair is verified in one matmul with no
       further shuffle; otherwise
    5. an id-shard groupby joins each candidate id to its vector (each
       touched vector crosses the wire once, plus once per pair side) and
       a pair-shard groupby computes exact cosines vectorized, also
       deduplicating pairs found via buckets in different shards.

    Exchange bytes per vector are independent of ``n_tables``; the logged
    estimate makes the trade auditable.

    Safe for the full signed int64 id range: the verify join carries an
    explicit ``kind`` column (Ray's arrow->pandas widens nullable int64
    to float64, so null-tagging is unusable and value sentinels would
    collide with real negative ids).  Rows with a NULL id or NULL vector
    are dropped at entry per the SQL-null contract
    (drop_invalid_vector_rows, logged).
    """
    import logging

    import ray

    logging.getLogger(__name__).info(
        "embedding_neardup_pairs: expected LSH recall at cosine=%.3f is %.3f "
        "(n_planes=%d, n_tables=%d); bucket shuffle ships 20-byte signature "
        "rows, vectors ride the verify join once per touched id",
        threshold,
        lsh_cosine_recall(threshold, n_planes, n_tables),
        n_planes,
        n_tables,
    )
    from deduce_ray.ops.agg import merge_shards
    from deduce_ray.ops.similarity import drop_invalid_vector_rows

    # SQL-null contract at the op boundary: one fused filter stage covers
    # the collapse keyer, signature pass and both vector-fetch legs
    ds_embeddings = ds_embeddings.map_batches(
        lambda b: drop_invalid_vector_rows(b, id_col, vec_col),
        batch_format="pyarrow",
    )

    dup_edges = None
    if collapse_exact:
        ds_embeddings, dup_edges = collapse_exact_dups(
            ds_embeddings, id_col, _vector_collapse_keyer(vec_col)
        )
    n_shards = merge_shards()

    def signatures(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "shard": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int64()),
                "id": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        batch = drop_invalid_vector_rows(batch, id_col, vec_col)
        if batch.num_rows == 0:
            return empty
        vecs = _vec_matrix(batch.column(vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        out_shard, out_bucket, out_ids = [], [], []
        weights = 1 << np.arange(n_planes)
        all_planes = _lsh_planes(vecs.shape[1], n_planes, n_tables)
        for t in range(n_tables):
            codes = ((vecs @ all_planes[t]) > 0) @ weights
            buckets = t * (1 << n_planes) + codes.astype(np.int64)
            out_shard.append((buckets % n_shards).astype(np.int32))
            out_bucket.append(buckets)
            out_ids.append(ids)
        return pa.table(
            {
                "shard": pa.array(np.concatenate(out_shard), type=pa.int32()),
                "bucket": pa.array(np.concatenate(out_bucket), type=pa.int64()),
                "id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            }
        )

    def candidate_pairs(df: pd.DataFrame) -> pd.DataFrame:
        docs, ia, ib = _hot_bucket_pairs(df, "bucket", "id", max_bucket)
        if docs is None:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                }
            )
        ids = docs["id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    sigs = ds_embeddings.map_batches(signatures, batch_format="pyarrow")
    cand = (
        sigs.groupby("shard")
        .map_groups(candidate_pairs, batch_format="pandas")
        .materialize()
    )

    n_pairs = cand.count()
    if n_pairs == 0:
        # nothing to verify: skip the join entirely (without this, the
        # id-shard leg would ship EVERY vector for a guaranteed-empty
        # result — the exact exchange the signature-only design avoids)
        import ray.data

        return _expand_dup_pairs(
            ray.data.from_arrow(
                pa.table(
                    {
                        "id_a": pa.array([], type=pa.int64()),
                        "id_b": pa.array([], type=pa.int64()),
                        "cosine": pa.array([], type=pa.float64()),
                    }
                )
            ),
            dup_edges,
            "cosine",
            1.0,
            "float64",
            expand_cap,
        )
    touched_ref = None
    if 0 < n_pairs <= broadcast_candidate_ids_max:
        # candidate_pairs dedupes within a shard only; the same pair found
        # via buckets in DIFFERENT shards appears once per shard
        cand_df = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        touched = np.unique(
            np.concatenate([cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()])
        )
        touched_ref = ray.put(pa.array(touched, type=pa.int64()))
        logging.getLogger(__name__).info(
            "embedding_neardup_pairs: %d candidate pairs over %d touched "
            "vectors; verify join ships only those vectors",
            n_pairs,
            len(touched),
        )

        if len(touched) <= driver_verify_max:
            # sparse-candidate fast path (the common case: near-dups are
            # rare relative to the corpus): collect ONLY the touched
            # vectors to the driver — a bounded materialization, like the
            # union-find path in neardup_clusters — and verify all pairs
            # in one matmul, skipping both join shuffles entirely
            def touched_vectors(batch: pa.Table) -> pa.Table:
                ids = np.asarray(
                    batch.column(id_col).to_pylist(), dtype=np.int64
                )
                keep = pc.is_in(
                    pa.array(ids, type=pa.int64()),
                    value_set=ray.get(touched_ref),
                ).to_numpy(zero_copy_only=False)
                idx = np.flatnonzero(keep)
                return pa.table(
                    {
                        "id": pa.array(ids[idx], type=pa.int64()),
                        "vec": pc.cast(
                            batch.column(vec_col).take(
                                pa.array(idx, type=pa.int64())
                            ),
                            pa.list_(pa.float64()),
                        ),
                    }
                )

            import ray.data

            vec_df = (
                ds_embeddings.map_batches(
                    touched_vectors, batch_format="pyarrow"
                )
                .to_pandas()
                .drop_duplicates(subset=["id"])
            )
            mat = np.asarray(list(vec_df["vec"]), dtype=np.float64)
            index = {int(i): p for p, i in enumerate(vec_df["id"])}
            ia = np.fromiter(
                (index[int(x)] for x in cand_df["id_a"]),
                dtype=np.int64,
                count=len(cand_df),
            )
            ib = np.fromiter(
                (index[int(x)] for x in cand_df["id_b"]),
                dtype=np.int64,
                count=len(cand_df),
            )
            # chunk over pairs: mat[ia]/mat[ib] would materialize two
            # (n_pairs, dim) float64 copies — at 5M pairs x 768 dims that
            # is ~60 GB on the driver.  65536-pair chunks bound the
            # working set to ~0.8 GB at 768 dims regardless of pair count.
            norms = np.linalg.norm(mat, axis=1)
            cos = np.empty(len(ia), dtype=np.float64)
            chunk = 65536
            for lo in range(0, len(ia), chunk):
                hi = min(lo + chunk, len(ia))
                ca, cb = ia[lo:hi], ib[lo:hi]
                denom = norms[ca] * norms[cb]
                denom[denom == 0] = 1.0
                cos[lo:hi] = (mat[ca] * mat[cb]).sum(axis=1) / denom
            # threshold on the UNROUNDED cosine (matching the minhash
            # convention and the join path below); round only the stored
            # value — rounding first would admit pairs in
            # [threshold - 5e-7, threshold) that an exact oracle excludes
            keep_pairs = cos >= threshold
            out = pd.DataFrame(
                {
                    "id_a": cand_df["id_a"].to_numpy(dtype=np.int64)[keep_pairs],
                    "id_b": cand_df["id_b"].to_numpy(dtype=np.int64)[keep_pairs],
                    "cosine": np.round(cos[keep_pairs], 6),
                }
            ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
            return _expand_dup_pairs(
                ray.data.from_pandas(out),
                dup_edges,
                "cosine",
                1.0,
                "float64",
                expand_cap,
            )

    # verify join, leg 1: requests (one row per pair side) + vectors,
    # co-sharded on id.  An explicit int8 ``kind`` column (0 = request,
    # 1 = vector) discriminates the legs — a negative-id_a sentinel would
    # misclassify real negative ids (hash-derived ids are signed int64).
    # id_a/id_b on the vector leg are plain -1 FILL values, never tested:
    # Ray's arrow->pandas conversion widens nullable int64 to float64
    # (rounds 63-bit ids), so nulls are not an option.
    def requests(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        join_id = np.concatenate([a, b])
        return pa.table(
            {
                "id_shard": pa.array(join_id % n_shards, type=pa.int64()),
                "join_id": pa.array(join_id, type=pa.int64()),
                "id_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
                "id_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
                "kind": pa.array(
                    np.zeros(2 * len(a), dtype=np.int8), type=pa.int8()
                ),
                "vec": pa.nulls(2 * len(a), type=pa.list_(pa.float64())),
            }
        )

    def vector_rows(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vector_rows(batch, id_col, vec_col)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = batch.column(vec_col)
        if touched_ref is not None:
            keep = pc.is_in(
                pa.array(ids, type=pa.int64()), value_set=ray.get(touched_ref)
            ).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(keep)
            ids = ids[idx]
            vecs = vecs.take(pa.array(idx, type=pa.int64()))
        n = len(ids)
        return pa.table(
            {
                "id_shard": pa.array(ids % n_shards, type=pa.int64()),
                "join_id": pa.array(ids, type=pa.int64()),
                "id_a": pa.array(np.full(n, -1), type=pa.int64()),
                "id_b": pa.array(np.full(n, -1), type=pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8), type=pa.int8()),
                "vec": pc.cast(vecs, pa.list_(pa.float64())),
            }
        )

    tagged = cand.map_batches(requests, batch_format="pyarrow").union(
        ds_embeddings.map_batches(vector_rows, batch_format="pyarrow")
    )

    def attach_vectors(df: pd.DataFrame) -> pd.DataFrame:
        have = df[df["kind"] == 1][["join_id", "vec"]].drop_duplicates(
            subset=["join_id"]
        )
        reqs = df[df["kind"] == 0][["join_id", "id_a", "id_b"]]
        out = reqs.merge(have, on="join_id")[["id_a", "id_b", "join_id", "vec"]]
        out = out.astype({"id_a": "int64", "id_b": "int64", "join_id": "int64"})
        out["pair_shard"] = (
            (out["id_a"].to_numpy().astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             ^ out["id_b"].to_numpy().astype(np.uint64))
            % n_shards
        ).astype("int64")
        return out

    def verify_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sides_a = df[df["join_id"] == df["id_a"]].drop_duplicates(
            subset=["id_a", "id_b"]
        )
        sides_b = df[df["join_id"] == df["id_b"]].drop_duplicates(
            subset=["id_a", "id_b"]
        )
        merged = sides_a.merge(
            sides_b, on=["id_a", "id_b"], suffixes=("_a", "_b")
        )
        if merged.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        mat_a = np.asarray(list(merged["vec_a"]), dtype=np.float64)
        mat_b = np.asarray(list(merged["vec_b"]), dtype=np.float64)
        na = np.linalg.norm(mat_a, axis=1)
        nb = np.linalg.norm(mat_b, axis=1)
        denom = na * nb
        denom[denom == 0] = 1.0
        cos = (mat_a * mat_b).sum(axis=1) / denom
        # unrounded threshold, rounded stored value (minhash convention)
        keep = cos >= threshold
        out = pd.DataFrame(
            {
                "id_a": merged["id_a"].astype("int64")[keep],
                "id_b": merged["id_b"].astype("int64")[keep],
                "cosine": np.round(cos[keep], 6),
            }
        )
        return out.reset_index(drop=True)

    joined = (
        tagged.groupby("id_shard")
        .map_groups(attach_vectors, batch_format="pandas")
        .groupby("pair_shard")
        .map_groups(
            lambda df: verify_pairs(df.drop(columns=["pair_shard"])),
            batch_format="pandas",
        )
    )
    return _expand_dup_pairs(
        joined, dup_edges, "cosine", 1.0, "float64", expand_cap
    )


def dedup_survivors(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    loser_broadcast_max: int = 50_000_000,
):
    """Exact-dedup as a corpus FILTER: return the full surviving rows (the
    minimum-id document of every distinct text), not just group stats.

    Scale shape — LOSER anti-join, not a full-row shuffle: only
    (hash_hi, hash_lo, id) int rows ride the dedup exchange; each shard
    emits the ids that LOSE (every id except the minimum of a duplicated
    hash).  The loser set is the corpus's duplicate rows — at realistic
    dup rates a small fraction of the input — so it ships in sorted
    chunks of at most ``loser_broadcast_max`` ids via ray.put (zero-copy
    numpy reads on the workers; the driver holds one chunk at a time)
    and the corpus streams through a vectorized searchsorted anti-join
    with NO full-row shuffle at all (measured, 2M-row 10%-dup stress:
    60.5 s full-row shuffle -> 4.4 s; 99.75%-dup adversarial: 18.8 s,
    ahead of the 23.6 s shuffle).  The loser pipeline itself runs
    entirely in Arrow — pandas would widen int64 ids to float64 in any
    group containing a null, rounding ids above 2^53.

    Preconditions: ``id_col`` values are UNIQUE and non-null (the
    module-wide doc-id contract) — with duplicate ids, "the minimum-id
    row" is ill-defined and an id that wins one text group while losing
    another would be dropped entirely.  The input dataset is consumed
    twice (hash pass + filter pass); hand this a re-readable source (a
    read_parquet pipeline), not an already-consumed iterator.
    """
    import ray

    from deduce_ray.ops.agg import merge_shards

    n_shards = merge_shards()

    def hash_ids_only(batch: pa.Table) -> pa.Table:
        # the dedup key rides the shuffle as TWO int64s (the full 128-bit
        # md5), not the 32-char hex string — half the exchange bytes and
        # int sorts instead of string sorts in the loser groupby
        hi, lo = _md5_words(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__h_hi": pa.array(hi),
                "__h_lo": pa.array(lo),
                # np.mod follows the divisor's sign: non-negative here
                "__shard": pa.array(np.mod(hi, n_shards)),
            }
        )

    def emit_losers(tbl: pa.Table) -> pa.Table:
        # Arrow-native all-but-first per (h_hi, h_lo): sort, then a row is
        # a loser iff it shares both hash words with its predecessor
        n = tbl.num_rows
        if n <= 1:
            return tbl.select([id_col]).slice(0, 0)
        tbl = tbl.sort_by(
            [
                ("__h_hi", "ascending"),
                ("__h_lo", "ascending"),
                (id_col, "ascending"),
            ]
        )
        hi = tbl.column("__h_hi").combine_chunks()
        lo = tbl.column("__h_lo").combine_chunks()
        same = pc.and_(
            pc.equal(hi.slice(1), hi.slice(0, n - 1)),
            pc.equal(lo.slice(1), lo.slice(0, n - 1)),
        )
        if isinstance(same, pa.ChunkedArray):
            same = same.combine_chunks()
        mask = pa.concat_arrays([pa.array([False]), same])
        return tbl.select([id_col]).filter(mask)

    # batch_size coalesces many small upstream blocks before the sort
    # exchange (hundreds of blocks x n_shards partitions of shuffle
    # metadata is the dominant cost for these narrow rows); num_cpus=0.9
    # breaks fusion so the coalescing cannot gate upstream granularity
    losers = (
        ds.map_batches(
            hash_ids_only,
            batch_format="pyarrow",
            batch_size=65536,
            num_cpus=0.9,
        )
        .groupby("__shard")
        .map_groups(emit_losers, batch_format="pyarrow")
        .materialize()
    )

    # pull loser ids in bounded chunks (driver peak = one chunk), sort
    # each, ray.put each — the worker-side filter checks every chunk
    refs = _chunked_id_refs(losers, id_col, loser_broadcast_max)
    if not refs:
        return ds

    return _drop_ids(ds, refs, id_col)


def _chunked_id_refs(ds, col: str, chunk_rows: int, on_batch=None) -> list:
    """Pull one int64 id column into bounded SORTED numpy chunks via
    ray.put (driver peak = one chunk plus the buffer being built) — the
    shared broadcast shape behind every loser/blocklist anti-join.
    ``on_batch`` optionally observes each non-empty pyarrow batch so a
    caller can derive flags in the same pass instead of re-reading."""
    import ray

    chunk_rows = max(int(chunk_rows), 1_000_000)
    refs, buf, buffered = [], [], 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        if on_batch is not None:
            on_batch(b)
        buf.append(b.column(col).to_numpy(zero_copy_only=False))
        buffered += b.num_rows
        if buffered >= chunk_rows:
            refs.append(ray.put(np.sort(np.concatenate(buf))))
            buf, buffered = [], 0
    if buf:
        refs.append(ray.put(np.sort(np.concatenate(buf))))
    return refs


def _drop_ids(ds, sorted_id_refs, id_col: str):
    """Streaming anti-join: drop rows whose id is in any of the ray.put
    SORTED numpy id arrays.  Membership is searchsorted per chunk —
    ``pc.is_in`` would rebuild its value-set hash index once PER BATCH,
    an O(ids) cost each call that dominated at multi-million-id sets;
    the sorted arrays are zero-copy plasma reads on the workers."""
    import ray

    def drop_blocked(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        for ref in sorted_id_refs:
            blocked = ray.get(ref)
            if not len(blocked):
                continue
            pos = np.minimum(np.searchsorted(blocked, ids), len(blocked) - 1)
            keep &= blocked[pos] != ids
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop_blocked, batch_format="pyarrow")


def anti_join_blocklist(ds, blocked_ids, id_col: str = "doc_id"):
    """Broadcast ANTI join: drop rows whose id is in the (small) blocklist
    — suppression/opt-out filtering.  The blocklist ships once via ray.put
    as a sorted numpy array; each batch filters via the shared
    searchsorted anti-join (:func:`_drop_ids`), which avoids pc.is_in's
    per-batch value-set rebuild for large lists."""
    import ray

    blocked_ref = ray.put(
        np.asarray(sorted(set(blocked_ids)), dtype=np.int64)
    )
    return _drop_ids(ds, [blocked_ref], id_col)
