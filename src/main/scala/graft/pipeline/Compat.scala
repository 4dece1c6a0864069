package graft.pipeline

/** Bug-compatibility switches reproducing the reference pipeline's
  * literal behavior (SURVEY §7.4.3). Default = intended semantics; turn
  * a flag on to get byte-faithful reference output where the reference's
  * own code deviates from its evident intent:
  *
  *  - `epochZeroNullDate`: the reference converts SAS dates with a
  *    truthiness guard (`if days:` — etl_functions.py:24), so day offset
  *    `0.0` (= 1960-01-01, a real date) is wrongly emitted as NULL.
  *  - `caseSensitiveCountryJoin`: the reference equi-joins i94res
  *    country names (UPPERCASE) against temperature countries (Title
  *    Case) without normalization (etl_functions.py:102–109), so nearly
  *    every country gets a NULL average temperature; the notebook's
  *    `.title()` fix (nb cell 47) is the intended semantics and the
  *    default here.
  */
final case class Compat(
    epochZeroNullDate: Boolean = false,
    caseSensitiveCountryJoin: Boolean = false)

object Compat {
  /** Intended semantics (default). */
  val default: Compat = Compat()

  /** Byte-faithful reproduction of the reference's actual outputs. */
  val reference: Compat = Compat(
    epochZeroNullDate = true,
    caseSensitiveCountryJoin = true)
}
