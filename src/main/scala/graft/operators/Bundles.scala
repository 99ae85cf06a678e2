package graft.operators

/**
 * F2/F3 bundle support (SURVEY §2.3): the reference's `Bundle` is a
 * user-labeled group of URLs — dedup is by LABEL (`str(bundle)` at the
 * mq put gate, cola/core/unit.py:54-75 + core/mq/store.py:252-254) and
 * the member URLs are GENERATED from the label at execute time
 * (`bundle.urls()`, e.g. app/weibo/bundle.py:41-48, one user → that
 * user's timeline pages).
 *
 * Deterministic wave reading: an outlink whose first capture group of
 * `pattern` is non-empty discovers the bundle with that label (and is
 * routed to the bundle channel INSTEAD of the plain-URL channel, like a
 * pattern whose unit class is Bundle); fresh labels — those passing the
 * label-seen gate, stored as `bundle://<label>` rows of the same seen
 * set, exactly the reference's mixed str(obj) dedup domain — expand via
 * `memberUrls(label)` in the same wave, and the members enter the
 * frontier as ordinary rows tagged with their bundle label.
 *
 * Bundle ERROR state is carried too (executor.py:474-546): a member
 * whose non-ignored retries exhaust raises the reference's
 * UnitRetryFailed, failing the whole bundle with its remaining
 * `current_urls` withheld — the wave reading poisons the bundle: its
 * surviving frontier rows leave as `bundle_blocked` dead rows (the
 * reference never fetches them either; it re-queues the failed bundle
 * whose front url deterministically re-fails forever). Ignored
 * exhausted members continue the bundle, matching `error_urls` append.
 *
 * Documented divergences from the reference's thread model (all pinned
 * by the simulator, which implements this same contract independently):
 * label expansion happens at discovery (the reference expands when the
 * bundle is popped; expansion is metadata work, not a fetch, so the
 * budget — which accounts fetches — is unaffected); member URLs
 * also pass the global URL-seen gate (the reference scopes member dedup
 * to the bundle; generated members are label-unique in practice, e.g.
 * per-user timeline pages, so the stronger gate changes nothing there);
 * and `error_urls` of a surviving bundle are not re-tried at later
 * executions (deterministic offline fetches would just re-fail them —
 * the retry budget already modeled those attempts).
 *
 * @param pattern    regex over the raw outlink; capture group 1 = label
 * @param memberUrls pure deterministic label → member URL list (runs
 *                   distributed as a UDF over fresh labels)
 */
case class BundleSpec(pattern: String, memberUrls: String => Seq[String])
    extends Serializable
