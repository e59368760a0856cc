package graft.operators

import graft.functions.GraftFunctions.doc_fingerprint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing step of a curation
  * pipeline: each stratum (language, source, quality bucket) keeps a
  * caller-set fraction of its rows. Selection is a PORTABLE per-row hash
  * test (the md5-based 60-bit hash of the id, via the existing
  * [[graft.functions.textexprs.Fingerprint]] kernel in its whole-string
  * regime), NOT `sample()`: stable across runs, partitionings, retries and
  * engines — a mixing recipe is reproducible row-for-row and auditable by
  * a SQL oracle (q58).
  *
  * Scale shape: one narrow filter over the scan (no shuffle, no RNG state,
  * rates ride as a literal map); at 100 TB the sample IS the scan cost. */
object Sampling {

  private val Scale = 1000000L

  /** Keep a row of stratum s iff hash(id) % 1e6 < round(rates(s) * 1e6)
    * (strata absent from `rates` fall back to `defaultRate`). ROUND, not
    * floor: 0.3 * 1e6 is 299999.99999... in IEEE double, and flooring it
    * would drop the 299999 hash bucket relative to the natural threshold
    * 300000 a SQL oracle writes — a one-bucket row-level reproducibility
    * divergence in the exact property this operator guarantees. The id is
    * hashed as its string form so the oracle reproduces it verbatim;
    * fingerprint k = 64 keeps any id shorter than 64 code points in the
    * whole-string hash regime. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val thresholds = rates.map { case (k, r) => k -> math.round(r * Scale) }
    val th =
      if (thresholds.isEmpty) lit(math.round(defaultRate * Scale))
      else coalesce(element_at(typedLit(thresholds), col(strataCol)),
        lit(math.round(defaultRate * Scale)))
    df.where(pmod(doc_fingerprint(col(idCol).cast("string"), 64), lit(Scale)) < th)
  }
}
