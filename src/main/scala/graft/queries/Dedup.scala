package graft.queries

object Dedup {
  val all: Seq[QueryDef] = Seq()
}
