package graft.bbha

/** Serializable fitness fns for BlindSearchSpec (anonymous closures in a
  * test class capture the non-serializable suite instance).
  */
object BlindSearchSpecHelpers extends Serializable {
  val const: Array[Int] => Double = _ => 1.0
}
