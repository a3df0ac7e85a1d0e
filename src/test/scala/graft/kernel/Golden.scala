package graft.kernel

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Committed golden-file loader (see scripts/gen_goldens.py for provenance —
  * goldens are outputs of the reference's own Python functions).
  */
object Golden {
  private val mapper = new ObjectMapper()

  def load(name: String): Vector[JsonNode] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource /golden/$name")
    try mapper.readTree(in).elements().asScala.toVector
    finally in.close()
  }

  def strs(n: JsonNode): Vector[String] = n.elements().asScala.map(_.asText()).toVector
}
