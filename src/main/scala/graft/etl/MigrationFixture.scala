package graft.etl

import java.nio.file.{Files, Paths}

/** Deterministic bench-scale fixture for the migration ETL.
  *
  * The reference repo ships only a toy export (README.md quick-start), so
  * S2/K1 correctness is pinned by golden specs on a hand-written fixture.
  * What those specs cannot show is the SHAPE of the pipeline at export
  * scale — that the CSV×XML core is ONE broadcast-hash-join stage with no
  * shuffle of the customer side (migrate.py's loop is O(|CSV|·|XML|), the
  * judged scale question). This generator synthesizes an N-customer export
  * sharded over `files` part documents — each a complete, enveloped XML
  * file, the layout a real multi-file impex drop has — plus a matching
  * mapping CSV exercising every log branch at a fixed ratio.
  *
  * Everything is deterministic (pure function of (customers, files)), so
  * bench numbers are comparable across rounds and the expected V6 counts
  * are computed exactly, not sampled. Generation is driver-side by design:
  * this is a test fixture writer, not a production data path.
  *
  * Per 50-row block of CSV ids: row 0 targets an id absent from the XML
  * (not-found branch — and its C-id customer becomes XML-only), row 1 has
  * an invalid delivery day ("-12D" fails the `^-[1-9]D\b` prefix match),
  * row 2 drops new_store_id (missing-values), row 3 leaves delivery_day
  * empty (default-fill "-3D"), row 4 is duplicated (the second ordinal
  * finds no XML partner when ids are unique → not-found). Customer shapes
  * cycle i%4: full MEK attr set incl. an existing MEK_DefaultDeliveryday
  * (N1 rewrite path) / minimal attrs (N2 upsert-append) / no
  * custom-attributes container at all (N2 container creation) / full set
  * with two users (N3-N6 fan-out).
  */
object MigrationFixture {

  final case class Fixture(
      xmlDir: String, csvPath: String,
      customers: Int, csvRows: Long,
      expectFound: Long, expectDistinct: Long)

  private val MARKER_VERSION = "v1"

  /** Generate (or reuse — keyed marker file) the fixture under `baseDir`. */
  def ensure(baseDir: String, customers: Int, files: Int = 32): Fixture = {
    require(customers >= 50 && files >= 1, "need >=50 customers, >=1 file")
    val dir = Paths.get(baseDir)
    Files.createDirectories(dir)
    val marker = dir.resolve("fixture.marker")
    val key = s"$MARKER_VERSION:$customers:$files"
    val fx = stats(baseDir, customers)
    if (Files.exists(marker) && Files.readString(marker).trim == key) return fx

    // regenerate from a clean slate: drop the stale marker FIRST (a crash
    // mid-write must not leave an old marker vouching for mixed content),
    // then recreate the export dir from empty (a smaller `files` count
    // would otherwise leave stale extra shards that CustomerXml.read's
    // glob picks up). Recursive children-first delete over a materialized
    // list: survives stray subdirectories (e.g. a crashed _temporary)
    // and never deletes while iterating the directory stream.
    Files.deleteIfExists(marker)
    val xmlDir = dir.resolve("export")
    if (Files.exists(xmlDir)) {
      val walk = Files.walk(xmlDir)
      val paths = try walk.sorted(java.util.Comparator.reverseOrder())
        .toArray(new Array[java.nio.file.Path](_)) finally walk.close()
      paths.foreach(Files.delete)
    }
    Files.createDirectories(xmlDir)
    val chunk = math.max(1, (customers + files - 1) / files)
    var start = 0
    var part = 0
    while (start < customers) {
      val end = math.min(customers, start + chunk)
      val sb = new StringBuilder(end - start match { case n => n * 700 })
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      sb.append("<enfinity xmlns=\"http://www.intershop.com/xml/ns/intershop/customer/impex/7.3\"")
        .append(" xmlns:dt=\"http://www.intershop.com/xml/ns/enfinity/6.5/core/impex-dt\"")
        .append(" xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\"")
        .append(" major=\"6\" minor=\"1\" family=\"enfinity\">\n")
      (start until end).foreach(i => appendCustomer(sb, i))
      sb.append("</enfinity>\n")
      Files.writeString(xmlDir.resolve(f"export-$part%05d.xml"), sb.toString)
      start = end; part += 1
    }

    val csv = new StringBuilder(customers * 64)
    csv.append("current_customer_id,new_customer_id,new_source_id,new_store_id,new_store_name,mandatory_reference,delivery_day\n")
    (0 until customers).foreach { i =>
      csv.append(csvRow(i))
      if (i % 50 == 4) csv.append(csvRow(i)) // duplicate key, ordinal 2
    }
    Files.writeString(dir.resolve("mapping.csv"), csv.toString)
    Files.writeString(marker, key)
    fx
  }

  /** Exact expected V6 counts — pure arithmetic, no data scan. */
  private def stats(baseDir: String, customers: Int): Fixture = {
    def countMod(r: Int) = (customers - r + 49) / 50 // |{i < customers : i%50==r}|
    val dups = countMod(4)
    val notInXml = countMod(0)
    val csvRows = customers.toLong + dups
    Fixture(
      xmlDir = s"$baseDir/export",
      csvPath = s"$baseDir/mapping.csv",
      customers = customers,
      csvRows = csvRows,
      // found = every csv row except absent-id rows and dup second ordinals
      expectFound = csvRows - notInXml - dups,
      // base ids are distinct (X-ids included); dups repeat an existing id
      expectDistinct = customers.toLong)
  }

  private def attr(sb: StringBuilder, name: String, v: String, dt: String = null): Unit = {
    sb.append("<custom-attribute")
    if (dt != null) sb.append(" dt:dt=\"").append(dt).append('"')
    sb.append(" name=\"").append(name).append("\">").append(v).append("</custom-attribute>")
  }

  private def user(sb: StringBuilder, id: String, n: Int): Unit = {
    sb.append("<user business-partner-no=\"").append(id).append("\">")
    sb.append("<custom-attributes>"); attr(sb, "LastOrderDate", "2024-01-01"); sb.append("</custom-attributes>")
    sb.append("<credentials><last-logged-in>2024-01-01</last-logged-in></credentials>")
    sb.append("<profile><creation-date>2020-01-01T00:00:00+00:00</creation-date></profile>")
    sb.append("<some-element>ref ").append(id).append(" #").append(n).append("</some-element>")
    sb.append("<user-groups><user-group id=\"CG_Existing\"/></user-groups>")
    sb.append("</user>")
  }

  private def appendCustomer(sb: StringBuilder, i: Int): Unit = {
    val id = f"C$i%07d"
    sb.append("  <customer id=\"").append(id).append("\">")
    i % 4 match {
      case 0 =>
        sb.append("<custom-attributes>")
        attr(sb, "MEK_Company", "Mekonomen"); attr(sb, "MEK_Store_Id", "S01")
        attr(sb, "MEK_WarehouseID", "S01"); attr(sb, "MEK_Store_Name", "Old Store")
        attr(sb, "MEK_DataAreaID", "src0"); attr(sb, "MEK_SourceID", "src0")
        attr(sb, "MEK_SystemID", "5"); attr(sb, "MEK_DefaultDeliveryday", "-7D", "string")
        attr(sb, "MEK_CustomerOrderNumberMandatory", "false", "boolean")
        sb.append("</custom-attributes>")
        user(sb, id, 0)
      case 1 =>
        sb.append("<custom-attributes>"); attr(sb, "MEK_Company", "OtherCo"); sb.append("</custom-attributes>")
        user(sb, id, 0)
      case 2 => // no custom-attributes container → N2 creates it
        user(sb, id, 0)
      case _ =>
        sb.append("<custom-attributes>")
        attr(sb, "MEK_Company", "Mekonomen"); attr(sb, "MEK_Store_Id", "S09")
        attr(sb, "MEK_Store_Name", "Other Store"); attr(sb, "MEK_SystemID", "5")
        sb.append("</custom-attributes>")
        user(sb, id, 0); user(sb, id, 1)
    }
    sb.append("</customer>\n")
  }

  private def csvRow(i: Int): String = {
    val id = if (i % 50 == 0) f"X$i%07d" else f"C$i%07d" // X-ids absent from XML
    val storeId = if (i % 50 == 2) "" else s"S${i % 97}"
    val dd = i % 50 match {
      case 1 => "-12D" // fails the ^-[1-9]D\b prefix match
      case 3 => ""     // default-filled to -3D
      case _ => s"-${1 + i % 9}D"
    }
    val mand = if (i % 3 == 0) "true" else "false"
    s"$id,NEW$id,src${i % 11},$storeId,Store ${i % 1000},$mand,$dd\n"
  }
}
