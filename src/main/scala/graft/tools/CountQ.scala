package graft.tools

/** Dev utility: print registry counts (registered / oracle-backed). */
object CountQ {
  def main(args: Array[String]): Unit = {
    val r = graft.Queries.registry
    println(s"registered=${r.size} oracle=${r.count(_.oracle.isDefined)}")
    val dup = r.groupBy(_.name).filter(_._2.size > 1).keys
    if (dup.nonEmpty) sys.error(s"DUPLICATE query names: ${dup.mkString(",")}")
  }
}
