package graft.queries

object TextOps {
  val all: Seq[QueryDef] = Seq()
}
