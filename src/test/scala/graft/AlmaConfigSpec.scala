package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AlmaConfigClient, AlmaConfigRefresh, AlmaTransport, DataSyncStore}

/** Canned-payload transport recording every requested path — the
  * fetch-and-paginate layer of alma_client.py without the HTTP stack.
  */
object FakeAlma {
  val requested = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val libraries =
    """{"library":[
      {"id":"L1","code":"SML","name":"Sterling","path":"/SML","description":"main",
       "campus":{"value":"C","description":"Central"}},
      {"id":"L2","code":"BASS","name":"Bass","path":"/BASS","description":null,
       "campus":{"value":"C","description":"Central"}}]}"""

  private def locations(lib: String) =
    s"""{"location":[
      {"id":${if (lib == "SML") 11 else 21},"code":"stacks","external_name":"Stacks",
       "name":"$lib stacks","suppress_from_publishing":"false"},
      {"id":${if (lib == "SML") 12 else 22},"code":"lsf","external_name":"LSF",
       "name":"$lib lsf","suppress_from_publishing":"true"}]}"""

  private def circDesks(lib: String) =
    s"""{"circ_desk":[
      {"id":${if (lib == "SML") 100 else 200},"code":"MAIN","name":"$lib desk",
       "primary":"true","reading_room_desk":"false",
       "location":[{"location_code":"stacks"},{"location_code":"UNKNOWN"}]}]}"""

  private val codeTable =
    """{"row":[{"code":"0","description":"Item not in place"},
               {"code":"1","description":"Item in place"}]}"""

  // 5 sets total, paged by the requested limit
  private def setsPage(offset: Int, limit: Int) = {
    val members = (offset until math.min(offset + limit, 5))
      .map(i => s"""{"id":"S$i","name":"set $i"}""").mkString(",")
    s"""{"total_record_count": 5, "set":[$members]}"""
  }

  val transport: AlmaTransport = new AlmaTransport {
    def get(path: String): String = {
      requested.add(path)
      path match {
        case "/conf/libraries/" => libraries
        case p if p.matches("/conf/libraries/\\w+/locations") =>
          locations(p.split("/")(3))
        case p if p.matches("/conf/libraries/\\w+/circ-desks") =>
          circDesks(p.split("/")(3))
        case p if p.startsWith("/conf/code-tables/") => codeTable
        case p if p.startsWith("/conf/sets?") =>
          val off = "offset=(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt
          val lim = "limit=(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt
          setsPage(off, lim)
        case p if p.startsWith("/conf/sets/") =>
          s"""{"id":"${p.split("/").last}","content":{"value":"BIB_MMS"}}"""
        case p => throw new IllegalArgumentException(s"unexpected path $p")
      }
    }
  }
}

class AlmaConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("full config refresh: endpoints, parsing, link resolution, conflict keys") {
    FakeAlma.requested.clear()
    val client = new AlmaConfigClient(spark, FakeAlma.transport)
    val store = new DataSyncStore(spark,
      Files.createTempDirectory("graft_cfg").toFile.getAbsolutePath, 4)
    val counts = AlmaConfigRefresh.run(client, store)
    assert(counts("libraries") == 2)
    assert(counts("locations") == 4)
    assert(counts("circ_desks") == 2)
    assert(counts("code_table_values") == 4) // 2 tables × 2 rows
    assert(counts("record_sets") == 5) // paginated index + per-set detail
    assert(store.read("record_set").filter($"set_json".contains("BIB_MMS"))
      .count() == 5)

    // endpoint paths exactly as alma_client.py builds them
    val paths = FakeAlma.requested.toArray.map(_.toString).toSet
    assert(paths.contains("/conf/libraries/"))
    assert(paths.contains("/conf/libraries/SML/locations"))
    assert(paths.contains("/conf/libraries/BASS/circ-desks"))
    assert(paths.contains("/conf/code-tables/BaseStatus"))
    assert(paths.contains("/conf/code-tables/ItemPolicy"))

    // suppress derivation + conflict keys landed
    val sup = store.read("location")
      .select("library_code", "code", "suppress").as[(String, String, String)]
      .collect().toSet
    assert(sup == Set(("SML", "stacks", "N"), ("SML", "lsf", "Y"),
                      ("BASS", "stacks", "N"), ("BASS", "lsf", "Y")))

    // links: only resolvable location codes (UNKNOWN dropped, :108)
    val links = store.read("location_circ_desk")
      .select("circ_desk_id", "location_id").as[(Long, Long)].collect().toSet
    assert(links == Set((100L, 11L), (200L, 21L)))

    // idempotent re-run: same rows, versions bump
    AlmaConfigRefresh.run(client, store)
    assert(store.read("location").count() == 4)
    assert(store.read("location").filter($"version" =!= 1L).count() == 0)
  }

  test("sets pagination walks offsets until total_record_count") {
    FakeAlma.requested.clear()
    val client = new AlmaConfigClient(spark, FakeAlma.transport)
    val pages = client.loadSets(limit = 2)
    assert(pages.count() == 3) // 5 sets, 2 per page
    val setReqs = FakeAlma.requested.toArray.map(_.toString)
      .filter(_.startsWith("/conf/sets"))
    assert(setReqs.toSeq == Seq(
      "/conf/sets?limit=2&offset=0&set_origin=UI",
      "/conf/sets?limit=2&offset=2&set_origin=UI",
      "/conf/sets?limit=2&offset=4&set_origin=UI"))
  }
}
