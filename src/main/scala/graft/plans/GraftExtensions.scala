package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{SetExprs, SketchExprs, TextExprs, VectorExprs}

/** The engine's SparkSessionExtensions entry point — the deployment route
  * for clusters that own the session builder:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Injects the engine's native Catalyst functions (currently
  * [[graft.functions.DotProduct graft_dot]],
  * [[graft.functions.SortedIntersectCount graft_sorted_intersect_count]]
  * and [[graft.functions.MinHashSig graft_minhash]])
  * into every session at build time, so SQL users get them too. Sessions the engine does NOT build
  * (e.g. the verification driver's) get the same functions registered
  * lazily per-session via [[graft.functions.VectorExprs.register]] from
  * `Tables.prep` — both routes are idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // plan-time scale linting (opt-in via spark.graft.scaleguard=true):
    // unpartitioned windows and hintless cartesian joins fail at
    // optimization instead of at week-2 of a 100 TB job — see [[ScaleGuardRule]]
    ext.injectOptimizerRule(_ => ScaleGuardRule)
    ext.injectFunction(VectorExprs.dotInfo)
    ext.injectFunction(VectorExprs.l2sqInfo)
    ext.injectFunction(SetExprs.sortedIntersectCountInfo)
    ext.injectFunction(SketchExprs.minhashInfo)
    ext.injectFunction(TextExprs.shingleSetInfo)
    ext.injectFunction(TextExprs.xxhash64ArrayInfo)
    ext.injectFunction(TextExprs.winnowInfo)
    ext.injectFunction(TextExprs.simhashInfo)
    ext.injectFunction(TextExprs.bpeEncodeInfo)
  }
}
