package graft.queries

/** TPC-DS verbatim bodies, continued — see [[DsPortBodies1]]. */
object DsPortBodies3 {
  val bodies: Seq[(String, String)] = Seq()
}
