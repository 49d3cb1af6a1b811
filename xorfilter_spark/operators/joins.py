"""Bank-prefiltered joins: use an approximate-membership bank as an
explicit runtime row filter on a join's big side.

This is the distributed raison d'être of the reference's filters
(/root/reference/README.md:9-13 positions xor/fuse filters as smaller,
faster Bloom replacements for exactly this membership-prune role): before
shuffling a 100-TB fact table for a join, probe each row against a bank
built over the dimension side's join keys and drop the guaranteed-miss
rows.  Zero false negatives means the final join result is EXACTLY the
plain join's result; the FPP only bounds how many doomed rows still pay
the shuffle (fuse16: ~2^-16 of non-matching rows leak through).

Spark's own AQE has a runtime bloom-filter rewrite
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but it is
heuristic-gated and bloom-based (~1.44x the space of xor8 at equal FPP,
README.md:60-66); this operator makes the prune explicit, reusable
(the bank persists — build once, prefilter every later join against the
same dimension), and incremental (merge_banks/streaming append).

Plan shape at scale: bank build = one 8-byte-digest shuffle of the SMALL
side; the probe is a zero-shuffle narrow map over the big side
(broadcast flattened bank, digest-only Arrow freight); the exact join
then shuffles only the surviving rows.  Shuffle volume drops by
~(1 - selectivity) of the big side, which at single-digit-percent join
selectivity is the dominant cost of the whole query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import bank as B


def prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    variant: str = "fuse16",
    num_shards: int | str = "auto",
    bank: DataFrame | None = None,
    probe: str = "broadcast",
) -> DataFrame:
    """Exact ``big JOIN small ON big_key = small_key``, with the big side
    pre-pruned through a bank over ``small[small_key]``.

    Result equality with the plain join holds for ``how`` in
    ('inner', 'left_semi'): zero false negatives keep every true match;
    false positives are removed by the exact join itself.  Default
    ``fuse16`` (FPP ~2^-16) makes the leaked-row shuffle negligible.

    ``big_key``/``small_key`` may each be a LIST of column names for a
    composite join key (digested through one ``xxhash64`` by the bank;
    the exact join condition is the AND of the pairwise equalities,
    null-rejecting on both sides like SQL equi-join semantics — matching
    the bank's null-key behaviour).

    Pass a prebuilt ``bank`` to amortize the build across many joins
    against the same dimension table.

    ``probe='broadcast'`` (default) collects+broadcasts the flattened bank
    — right whenever the dimension bank fits executor memory (a 10^9-key
    fuse16 bank is ~2.3 GB).  ``probe='cogroup'`` instead co-partitions
    probes and bank shards (``contains_join``, digest payload): no single
    machine ever holds the whole bank, the big side pays one extra
    digest-column shuffle — the beyond-broadcast shape for 10^12-key
    dimensions.  The cogroup join-back is left to ``contains_join``'s
    AQE default: here the hit table is distinct-FACT-key digests, so its
    size spans both regimes and the runtime-stats decision (broadcast
    only when the measured hit table is actually small) is the one that
    is safe at 10^12 keys without penalizing the small case.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "prefilter_join preserves exact semantics only for "
            "'inner'/'left_semi' joins"
        )
    if probe not in ("broadcast", "cogroup"):
        raise ValueError("probe must be 'broadcast' or 'cogroup'")
    if bank is None:
        bank = B.build_bank(small, small_key, variant=variant, num_shards=num_shards)
    if probe == "cogroup":
        pruned = (
            B.contains_join(big, big_key, bank, "__c", payload="digest")
            .where("__c")
            .drop("__c")
        )
    else:
        pruned = B.approx_semi_join(big, big_key, bank)
    bkeys = list(big_key) if isinstance(big_key, (list, tuple)) else [big_key]
    skeys = list(small_key) if isinstance(small_key, (list, tuple)) else [small_key]
    if len(bkeys) != len(skeys):
        raise ValueError("big_key and small_key must have the same arity")
    cond = None
    for bk, sk in zip(bkeys, skeys):
        c = pruned[bk] == small[sk]
        cond = c if cond is None else (cond & c)
    return pruned.join(small, cond, how)
