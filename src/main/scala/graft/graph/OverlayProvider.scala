package graft.graph

import graft.meta.GraphSchema
import org.apache.spark.sql.DataFrame

/** A GraphProvider with some node tables replaced — used to query the
  * result of a DML rewrite without touching the base provider.
  */
final case class OverlayProvider(
    base: GraphProvider,
    overrides: Map[String, DataFrame]) extends GraphProvider {
  def schema: GraphSchema = base.schema
  def nodeTable(name: String): DataFrame =
    overrides.getOrElse(name, base.nodeTable(name))
}
