"""Ray Data execution-context tuning shared by every Ray-facing module.

Called from the engine's own entry surfaces — the corpus/sources readers
(dataset creation), the CLI, bench, the driver contract module, and the
test session fixture — NEVER at library import: importing deduce_ray must
not mutate the process-global DataContext of an application that embeds
this engine next to its own Ray Data pipelines (nor drag a multi-second
``import ray.data`` into Ray-free uses of the pure-numpy helpers).
Embedders composing these ops over their own datasets keep their own
context unless they call :func:`tune_data_context` explicitly.
"""

from __future__ import annotations

import os

_applied = False


def tune_data_context() -> None:
    """Disable Ray Data's per-operator resource reservation for this
    engine's pipelines (DEDUCE_RAY_OP_RESERVATION=1 restores the default).

    Measured on the graph pipeline (annotate -> combiner -> salted sort ->
    partitioned sink, a 5-map-operator chain): with the default
    ReservationOpResourceAllocator the chain STARVES — at num_cpus=6 the
    annotate stage ran ~1 task at a time (183 s task CPU vs 198 s wall,
    195 s task_submission_backpressure_time; the 50% reservation split
    over the chain's operators leaves each map op less than one full CPU,
    so everything queues behind the shared pool), and at num_cpus=24 the
    same job still paid 2.1x (24.4 s -> 11.4 s without reservation; the
    6-CPU leg went 198 s -> 38.5 s).  This engine's stages keep blocks
    small and bounded (per-batch combiners, constant-width shuffle rows),
    so the reservation mechanism's protection against store-hogging
    operators buys nothing here, while its starvation cost is
    catastrophic on small CPU budgets — exactly the regime the N-vs-4N
    scaling criterion measures.
    """
    global _applied
    if _applied:
        return
    try:
        import ray.data

        ctx = ray.data.DataContext.get_current()
        if os.environ.get("DEDUCE_RAY_OP_RESERVATION") != "1":
            ctx.op_resource_reservation_enabled = False
        # OPT-IN hash-partitioned shuffle (DEDUCE_RAY_HASH_SHUFFLE=1).
        # Hash shuffle is attractive — measured 31-35 s -> 8.6 s on a
        # 2M-row / 50k-group map_groups, it skips the sort path's sample
        # pass (the source of the documented 2-3x sort-sample variance in
        # minhash_clusters / kg_pagerank / pricing_summary), and it is
        # the shape a real cluster wants — but Ray 2.49.2's implementation
        # has a POISON-BLOCK bug that rules it out as the default here:
        # map_groups emits zero-row, ZERO-SCHEMA blocks for empty hash
        # partitions (the sort path's long-known cosmetic "different
        # schema (.)" empties), and when a DOWNSTREAM hash exchange's
        # aggregator partition receives only such blocks its finalize
        # calls block.sort_by(key) on a column-less table ->
        # "ArrowInvalid: No match for FieldRef.Name(<key>) in  ".
        # kg_pagerank_sqlpreds (chained groupbys inside the iteration
        # loop) crashed 100% reproducibly; any of the ~54 map_groups
        # sites whose output feeds another exchange can crash FLAKILY
        # depending on which partitions land empty.  Repro + knob probe:
        # scripts/probe_hash_shuffle.py.  Revisit on a Ray upgrade.
        if os.environ.get("DEDUCE_RAY_HASH_SHUFFLE") == "1":
            import ray as _ray
            from ray.data.context import ShuffleStrategy

            if _ray.is_initialized():
                ncpu = int(_ray.cluster_resources().get("CPU", 0)) or (
                    os.cpu_count() or 8
                )
            else:
                ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 0) or 0) or (
                    os.cpu_count() or 8
                )
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            # The upstream defaults assume a real cluster (200 partitions,
            # CPU-reserving aggregator actors, and a 300 s grace wait when
            # the reservation cannot be met).  On a small local budget that
            # wait IS a stall: at num_cpus=8 the first groupby asked for
            # 16 reserved CPUs and slept 5 minutes.  Size the exchange to
            # the actual CPU budget, make aggregators effectively free to
            # schedule (they accumulate Arrow partials; the work happens in
            # finalize tasks), and fail over to queueing instead of waiting.
            ctx.default_hash_shuffle_parallelism = max(8, 2 * ncpu)
            ctx.max_hash_shuffle_aggregators = max(4, min(16, ncpu))
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.02
            ctx.min_hash_shuffle_aggregator_wait_time_in_s = 1
        # This engine's list<float> columns (resized pixels, frame
        # features, embeddings) are genuine variable-length lists with
        # nulls for non-image rows.  Ray Data's tensor-extension
        # auto-cast fires whenever a batch HAPPENS to hold only
        # equal-length non-null lists — under limit()+actor pools batch
        # composition is timing-dependent, so the cast succeeds on some
        # runs and then fails unifying against a null-bearing block
        # ("Tried to cast column pixels to the TensorArray ... failed").
        # Nothing in this engine consumes the tensor extension type;
        # disable the cast so list columns stay list columns.
        ctx.enable_tensor_extension_casting = False
        _applied = True
    except Exception:  # pragma: no cover — ray absent or API moved
        pass
