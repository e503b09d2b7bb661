package graft.ingest

import java.io.StringReader
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** One MediaWiki page, the ingest-side record
  * (`ingest/.../ingest/ArticleExtractor.java:43-59`).
  */
case class Article(
    id: Int,
    title: String,
    timestamp: Long, // epoch millis
    comments: String,
    text: String,
    language: String)

/** StAX pull-parse of one `<page>…</page>` chunk → Article. Mirrors the
  * element subset the reference reads (`ArticleExtractor.java:134-206`):
  * `<title>`, first `<id>` outside `<revision>`, `<revision><timestamp>`,
  * `<revision><comment>`, `<revision><text>`. Unparseable timestamp ⇒
  * article dropped (return None), matching the reference.
  */
object ArticleExtractor {
  private val tsFormat = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")

  def parseTimestamp(s: String): Option[Long] =
    try Some(LocalDateTime.parse(s, tsFormat).toInstant(ZoneOffset.UTC).toEpochMilli)
    catch { case _: Exception => None }

  def extract(pageXml: String, language: String): Option[Article] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(new StringReader(pageXml))
    var title: String     = null
    var id: Option[Int]   = None
    var ts: Option[Long]  = None
    var comments: String  = ""
    var text: String      = ""
    var inRevision        = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "revision" => inRevision = true
              case "title"    => title = reader.getElementText
              case "id" if !inRevision && id.isEmpty =>
                id = scala.util.Try(reader.getElementText.trim.toInt).toOption
              case "timestamp" if inRevision => ts = parseTimestamp(reader.getElementText.trim)
              case "comment" if inRevision   => comments = reader.getElementText
              case "text" if inRevision      => text = reader.getElementText
              case _                         => ()
            }
          case XMLStreamConstants.END_ELEMENT if reader.getLocalName == "revision" =>
            inRevision = false
          case _ => ()
        }
      }
    } finally reader.close()
    for { i <- id; t <- ts } yield Article(i, title, t, comments, text, language)
  }
}
