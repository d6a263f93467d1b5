"""Lineage + stats hygiene for iterative DataFrame algorithms.

Two separate traps hit any loop of the form ``df = f(df)``:

1. **Lineage growth** — if ``df`` feeds two branches of the next round
   (a self-join, or a main/convergence-check pair), the logical plan
   doubles per round and every action re-executes all prior rounds.
   ``localCheckpoint`` fixes this.

2. **Estimated-stats growth** — ``localCheckpoint`` (and reliable
   ``checkpoint``) wrap the materialized RDD in a ``LogicalRDD`` that
   PRESERVES the origin plan's estimated ``Statistics``. Catalyst's
   size-only estimate for a join is the BigInt PRODUCT of its
   children's ``sizeInBytes``, so an iterated self-join doubles the
   *digit count* of the estimate every round: by round ~18 the driver
   spends minutes per round inside ``BigInteger.multiply`` during
   planning (measured on a 2 000-row frame: 0.3 s/round flat with the
   reset below vs 14 s at round 22 / 219 s at round 24 without — pure
   driver CPU in ``SizeInBytesOnlyStatsPlanVisitor.visitJoin``).

``materialize`` breaks both: persisting first makes the optimized
plan an ``InMemoryRelation``, and the eager checkpoint's materializing
pass populates that cache before ``LogicalRDD.fromDataset`` snapshots
stats — so the snapshot sees the ACTUAL cached byte size, not the
compounded product; the checkpoint then truncates lineage as usual
and the temporary cache is dropped. (One action total — the explicit
``count()`` this used to run first was a second full read of the
frame; see the function docstring.)

At real cluster scale the same discipline applies — swap
``localCheckpoint`` for reliable ``checkpoint`` (executor loss safety);
the persist-before-checkpoint ordering is what resets the stats either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Materialize ``df`` with lineage truncated AND estimated stats
    reset to the actual cached size (see module docstring). Returns the
    checkpointed frame; the temporary cache is unpersisted before
    returning, so no storage is pinned beyond the checkpoint blocks.

    If the SparkContext has a checkpoint directory set, the truncation
    uses RELIABLE ``checkpoint`` instead of ``localCheckpoint``:
    localCheckpoint blocks live in the block manager, so under memory
    pressure an evicted/cleaned block from round N kills round N+1 with
    "Block rdd_X_Y does not exist" (observed live: ml_pagerank at
    sf100-equivalent, 600M-row edges on a 40g local JVM). Reliable
    checkpoint files survive eviction and executor loss — setting
    ``sc.setCheckpointDir`` is the cluster-mode contract anyway; this
    just makes every iterative operator honor it automatically.

    IMPORTANT companion conf: Spark never deletes reliable checkpoint
    files unless ``spark.cleaner.referenceTracking.cleanCheckpoints``
    is true (default FALSE), so a per-round materialize would otherwise
    accumulate one frame-sized directory per iteration for the life of
    the application — the same disk-exhaustion failure mode the
    reliable branch exists to fix, moved into the checkpoint store.
    ``session.get_spark`` sets it; any hand-built session that calls
    ``setCheckpointDir`` must set it too (as must any cluster deploy
    that doesn't snapshot checkpoints deliberately).

    r11 optimization round: no separate ``count()`` job. The eager
    checkpoint's own materializing pass runs THROUGH the persisted
    plan, populating the cache as a side effect, and
    ``LogicalRDD.fromDataset`` snapshots statistics AFTER that pass —
    at which point the InMemoryRelation reports its ACTUAL cached
    size, which is all the count() ever existed to force. One action
    per materialize instead of two, at every scale (the count was a
    second full read of the cached frame). Pinned by
    tests/test_iterutil.py::test_materialize_stats_reset_iterated_self_join —
    the iterated-self-join stats blowup the count used to prevent
    stays prevented (measured: 26 rounds flat; the no-persist control
    exceeds the round budget by round ~20)."""
    df.persist()
    try:
        if df.sparkSession.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)
    finally:
        df.unpersist()
