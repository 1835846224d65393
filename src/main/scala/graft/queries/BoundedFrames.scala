package graft.queries

/** Registry of the queries whose physical plans legitimately contain
  * an EMPTY-partition-spec Window — i.e. a window that plans as ONE
  * task — together with the reason that task stays bounded at any
  * corpus size (r16, automating the global-window audit that caught
  * q_rfm and q_interval_concurrency only by hand in round 15).
  *
  * Contract, enforced by PlanSweepSpec against every batch query's
  * built plan: a global window is allowed ONLY over a frame whose row
  * count is bounded by something other than the data volume — a
  * calendar span, a fixed grid (per-myriad, log2 buckets), a constant
  * top-k, a dimension table. Every such query must carry an entry
  * here naming the bound; an entry whose query no longer plans a
  * global window is STALE and also fails the spec, so the registry
  * cannot rot. A query that needs a global rank over a
  * corpus-proportional frame must use [[RankOps.withGlobalRank]]
  * instead (range-sliced, P-way parallel — that shape plans no global
  * Window at all).
  */
object BoundedFrames {

  val globalWindowJustified: Map[String, String] = Map(
    "q_decile_lift" ->
      "cumulative capture/lift over the constant 10-row decile frame (ranks themselves come from RankOps, no global sort)",
    "q_bootstrap_ci" ->
      "rank-5/rank-95 order statistics over the B = 100 replica-mean frame — B is a plan constant",
    "q_apportionment" ->
      "row_number over the bounded |sources| frame (one corpus aggregate upstream); seats grid is a constant 1000",
    "q_growth_accounting" ->
      "lag over the byDay frame — bounded by the observation CALENDAR span, not by events or users",
    "q_revenue_pareto" ->
      "cumulative shares over the log2 cent-total histogram — <= 64 buckets by int64 bit-length construction",
    "q_skyline" ->
      "running max over |distinct p_size| rows (attribute domain, 50) — corpus-sized work is the upstream hash aggregate",
    "q_survival_curve" ->
      "two cumulative windows over the day-grain risk table — bounded by the CALENDAR span since first signup",
    "q_zipf_fit" ->
      "cumulative over the floor-log2 frequency histogram — <= 64 levels by construction (in-code '<= 64-row frame' note)",
  )
}
