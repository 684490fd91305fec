package graft

/** A scale guard REFUSING an SF by contract — thrown when a default-ON
  * guard's pre-agg measures that the requested geometry would blow past
  * its cap (q64's cell-population guard, q127/q271's pair-volume guard,
  * q164's block-volume guard). Distinct from a generic
  * `IllegalStateException` so consumers classify by TYPE, not by message
  * substring (a genuine failure whose message happened to contain
  * "guard:" would otherwise be misread as a designed trip — r18 ADVICE):
  * [[Bench]] records the query under `guard_trips` instead of `failed`,
  * and `tools/x100_sweep.py` treats it as a designed refusal (exit 0).
  * Extends `IllegalStateException` so pre-r19 callers that matched on
  * the parent type keep working. The message still carries the "guard:"
  * token plus the measured volumes, the hottest bucket and the remedy —
  * the type is for machines, the message for humans. */
final class GuardTripException(message: String) extends IllegalStateException(message)
