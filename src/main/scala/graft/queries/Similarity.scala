package graft.queries

object Similarity {
  val all: Seq[QueryDef] = Seq()
}
