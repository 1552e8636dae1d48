package graft.api

import org.apache.spark.sql.DataFrame

/** Table-maintenance primitives for snapshot-style datalake tables. */
object Tables {

  /** Keyed upsert (MERGE): rows of `updates` replace same-keyed rows of
    * `base`; unmatched update rows insert. Both frames must share a schema;
    * `keys` are the merge columns. One left-anti shuffle join plus a union —
    * both sides hash-partition on the key, nothing driver-side, so the
    * shape is the same at 10⁶ or 10¹² rows.
    *
    * PRECONDITIONS the caller owns (checking them would force an eager job
    * on every lazy build): `updates` must carry at most ONE row per key —
    * duplicate-keyed update rows all land in the result (pre-aggregate the
    * change batch, e.g. keep the latest by version, before merging); and
    * key columns must be non-null — SQL null-equality means a null-keyed
    * base row is never anti-joined away, so a null-keyed update INSERTS
    * alongside it rather than replacing it.
    *
    * Idempotent for a fixed conforming change batch:
    * `upsert(upsert(b, u), u)` equals `upsert(b, u)` (the anti-join removes
    * exactly the keys the union re-adds).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base
      .join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti")
      .unionByName(updates)
}
