package x
/** scaladoc
  * block
  */
object App { val n = 1 }
