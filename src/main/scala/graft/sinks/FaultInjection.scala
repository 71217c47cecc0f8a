package graft.sinks

/** Test-only crash simulation for the multi-step writers.
  *
  * Every multi-step writer (lock → staging write → retire-rename →
  * publish-rename → cleanup; index data append → freshness bump) calls
  * [[point]] with a `"<writer>:<step>"` label at each step boundary.
  * Production default is a no-op; FaultInjectionSpec swaps in a hook
  * that throws at one chosen label, simulating a crash at exactly that
  * boundary, then asserts the on-disk contract: a reader sees either
  * the old or the new artifact — or, in the one documented
  * between-renames instant, an ABSENT live path with full copies
  * preserved at the `.tmp`/`.bak` paths — but never a torn artifact.
  *
  * A `@volatile var` (not a parameter) so the hook reaches nested call
  * chains (deleteKeysPruned → rewriteLeaf → publish, bumpIndexMeta →
  * writeIndexMeta → publish) without threading test plumbing through
  * public signatures. Specs must reset it in `finally`.
  */
private[graft] object FaultInjection {
  @volatile var hook: String => Unit = _ => ()

  def point(label: String): Unit = hook(label)
}
