package graft.queries

/** TPC-DS verbatim bodies, continued — see [[DsPortBodies1]]. */
object DsPortBodies2 {
  val bodies: Seq[(String, String)] = Seq()
}
