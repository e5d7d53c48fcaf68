package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Golden queries from the reference's air-routes corpus
  * (cozo-core/tests/air_routes.rs; data CSVs shipped alongside),
  * run from script text through CozoDb — the same end-to-end path a
  * reference user exercises. Expected values are the reference's own
  * assertions.
  */
class AirRoutesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  val dataDir = "/root/reference/cozo-core/tests"

  lazy val db: CozoDb = {
    val d = new CozoDb(spark)
    assume(new java.io.File(s"$dataDir/air-routes-latest-nodes.csv").exists())
    d.run(
      s"""res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon] <~
         |    CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any', 'Any', 'Int?', 'Float?', 'Float?', 'Any', 'Any', 'Float?', 'Float?'],
         |              url: 'file://$dataDir/air-routes-latest-nodes.csv',
         |              has_headers: true)
         |?[code, icao, desc, region, runways, longest, elev, country, city, lat, lon] :=
         |    res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon],
         |    label == 'airport'
         |:replace airport { code => icao, desc, region, runways, longest, elev, country, city, lat, lon }
         |""".stripMargin)
    d.run(
      s"""res[idx, label, typ, code, icao, desc] <~
         |    CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'],
         |              url: 'file://$dataDir/air-routes-latest-nodes.csv',
         |              has_headers: true)
         |?[code, desc] := res[idx, label, typ, code, icao, desc], label == 'country'
         |:replace country { code => desc }
         |""".stripMargin)
    d.run(
      s"""res[idx, label, typ, code, icao, desc] <~
         |    CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'],
         |              url: 'file://$dataDir/air-routes-latest-nodes.csv',
         |              has_headers: true)
         |?[idx, code, desc] := res[idx, label, typ, code, icao, desc], label == 'continent'
         |:replace continent { idx => code, desc }
         |""".stripMargin)
    d.run(
      s"""res[idx, label, typ, code] <~
         |    CsvReader(types: ['Int', 'Any', 'Any', 'Any'],
         |              url: 'file://$dataDir/air-routes-latest-nodes.csv',
         |              has_headers: true)
         |?[idx, code] := res[idx, label, typ, code]
         |:replace idx2code { idx => code }
         |""".stripMargin)
    d.run(
      s"""res[] <~
         |    CsvReader(types: ['Int', 'Int', 'Int', 'String', 'Float?'],
         |              url: 'file://$dataDir/air-routes-latest-edges.csv',
         |              has_headers: true)
         |?[fr, to, dist] :=
         |    res[idx, fr_i, to_i, typ, dist],
         |    typ == 'route',
         |    *idx2code[fr_i, fr],
         |    *idx2code[to_i, to]
         |:replace route { fr, to => dist }
         |""".stripMargin)
    d.run(
      s"""res[] <~
         |    CsvReader(types: ['Int', 'Int', 'Int', 'String'],
         |              url: 'file://$dataDir/air-routes-latest-edges.csv',
         |              has_headers: true)
         |?[entity, contained] :=
         |    res[idx, fr_i, to_i, typ],
         |    typ == 'contains',
         |    *idx2code[fr_i, entity],
         |    *idx2code[to_i, contained]
         |:replace contain { entity, contained }
         |""".stripMargin)
    d.run("::remove idx2code")
    d
  }

  def rows(script: String): Seq[Seq[Any]] =
    db.run(script).collect().toSeq.map(_.toSeq)

  test("init loads the corpus") {
    assert(db.relation("airport").count() == 3504)
    assert(db.relation("route").count() == 50637)
  }

  test("starts_with (air_routes.rs:338)") {
    assert(rows("?[code] := *airport{code}, starts_with(code, 'US')")
      .map(_.head).sortBy(_.toString) ==
      Seq("USA", "USH", "USJ", "USK", "USM", "USN", "USQ", "UST", "USU"))
  }

  test("range_check (air_routes.rs:369)") {
    assert(rows(
      """r[code, dist] := *airport{code}, *route{fr: code, dist};
        |?[dist] := r['PEK', dist], dist > 7000, dist <= 7722;""".stripMargin)
      .map(_.head.asInstanceOf[Double]).sorted == Seq(7176.0, 7270.0, 7311.0, 7722.0))
  }

  test("no_airports (air_routes.rs:391)") {
    assert(rows("?[desc] := *country{code, desc}, not *airport{country: code};")
      .map(_.head).sortBy(_.toString) ==
      Seq("Andorra", "Liechtenstein", "Monaco", "Pitcairn", "San Marino"))
  }

  test("no_routes_airport (air_routes.rs:418)") {
    assert(rows("?[code] := *airport{code}, not *route{fr: code}, not *route{to: code}")
      .map(_.head).sortBy(_.toString) ==
      Seq("AFW", "APA", "APK", "BID", "BVS", "BWU", "CRC", "CVT", "EKA", "GYZ",
        "HFN", "HZK", "ILG", "INT", "ISL", "KGG", "NBW", "NFO", "PSY", "RIG",
        "SFD", "SFH", "SXF", "TUA", "TWB", "TXL", "VCV", "YEI"))
  }

  test("runway_distribution (air_routes.rs:446)") {
    assert(rows("?[runways, count(code)] := *airport{code, runways}")
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq((1L, 2429L), (2L, 775L), (3L, 227L), (4L, 53L), (5L, 14L), (6L, 4L), (7L, 2L)))
  }

  test("most_out_routes with :sort (air_routes.rs:475)") {
    assert(rows(
      """route_count[fr, count(fr)] := *route{fr};
        |?[code, n] := route_count[code, n], n > 180;
        |:sort -n;""".stripMargin).map(r => (r.head, r(1))) ==
      Seq(("FRA", 310L), ("IST", 309L), ("CDG", 293L), ("AMS", 283L), ("MUC", 270L),
        ("ORD", 265L), ("DFW", 253L), ("DXB", 248L), ("PEK", 248L), ("ATL", 242L),
        ("DME", 232L), ("LGW", 232L), ("LHR", 221L), ("DEN", 217L), ("MAN", 216L),
        ("LAX", 214L), ("PVG", 213L), ("STN", 211L), ("MAD", 206L), ("VIE", 206L),
        ("JFK", 204L), ("BCN", 203L), ("EWR", 203L), ("BER", 202L), ("FCO", 201L),
        ("DUS", 199L), ("IAH", 199L), ("MIA", 196L), ("YYZ", 195L), ("BRU", 194L),
        ("CPH", 194L), ("DOH", 187L), ("DUB", 185L), ("CLT", 184L), ("SVO", 181L)))
  }

  test("most_routes: aggregation accumulates across clauses (air_routes.rs:539)") {
    assert(rows(
      """route_count[a, count(a)] := *route{fr: a}
        |route_count[a, count(a)] := *route{to: a}
        |?[code, n] := route_count[code, n], n > 400
        |:sort -n;""".stripMargin).map(r => (r.head, r(1))).take(8) ==
      Seq(("FRA", 620L), ("IST", 618L), ("CDG", 587L), ("AMS", 568L), ("MUC", 541L),
        ("ORD", 529L), ("DFW", 506L), ("PEK", 497L)))
  }

  test("airport_with_one_route (air_routes.rs:570)") {
    assert(rows(
      """route_count[fr, count(fr)] := *route{fr}
        |?[count(a)] := route_count[a, n], n == 1;""".stripMargin) == Seq(Seq(777L)))
  }

  test("single_runway_with_most_routes (air_routes.rs:589)") {
    assert(rows(
      """single_or_lgw[code] := code = 'LGW'
        |single_or_lgw[code] := *airport{code, runways}, runways == 1
        |out_counts[a, count(a)] := single_or_lgw[a], *route{fr: a}
        |?[code, city, out_n] := out_counts[code, out_n], *airport{code, city}
        |:order -out_n;
        |:limit 10;""".stripMargin).map(r => (r.head, r(1), r(2))) ==
      Seq(("LGW", "London", 232L), ("STN", "London", 211L), ("CTU", "Chengdu", 139L),
        ("LIS", "Lisbon", 139L), ("BHX", "Birmingham", 130L), ("LTN", "London", 130L),
        ("SZX", "Shenzhen", 129L), ("CKG", "Chongqing", 122L), ("STR", "Stuttgart", 121L),
        ("CRL", "Brussels", 117L)))
  }

  test("most_routes_in_canada (air_routes.rs:622)") {
    assert(rows(
      """ca_airports[code, count(code)] := *airport{code, country: 'CA'}, *route{fr: code}
        |?[code, city, n_routes] := ca_airports[code, n_routes], *airport{code, city}
        |:order -n_routes;
        |:limit 10;""".stripMargin).map(r => (r.head, r(1), r(2))) ==
      Seq(("YYZ", "Toronto", 195L), ("YUL", "Montreal", 123L), ("YVR", "Vancouver", 106L),
        ("YYC", "Calgary", 75L), ("YEG", "Edmonton", 48L), ("YHZ", "Halifax", 45L),
        ("YWG", "Winnipeg", 38L), ("YOW", "Ottawa", 36L), ("YZF", "Yellowknife", 21L),
        ("YQB", "Quebec City", 20L)))
  }

  test("uk_count (air_routes.rs:658)") {
    assert(rows("?[region, count(region)] := *airport{country: 'UK', region}")
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq(("GB-ENG", 27L), ("GB-NIR", 3L), ("GB-SCT", 25L), ("GB-WLS", 3L)))
  }

  test("parallel_counts (air_routes.rs:189)") {
    assert(rows(
      """a[count(fr)] := *route{fr}
        |b[count(fr)] := *route{fr}
        |c[count(fr)] := *route{fr}
        |d[count(fr)] := *route{fr}
        |e[count(fr)] := *route{fr}
        |?[x] := a[a], b[b], c[c], d[d], e[e], x = a + b + c + d + e""".stripMargin) ==
      Seq(Seq(50637L * 5)))
  }

  test("airports_by_country incl. zero counts (air_routes.rs:679)") {
    val res = rows(
      """airports_by_country[country, count(code)] := *airport{code, country}
        |?[country, count] := airports_by_country[country, count];
        |?[country, count] := *country{code: country}, not airports_by_country[country, _], count = 0
        |:order count""".stripMargin).map(r => (r.head, r(1)))
    assert(res.take(5) == Seq(("AD", 0L), ("LI", 0L), ("MC", 0L), ("PN", 0L), ("SM", 0L)))
    assert(res.takeRight(4) == Seq(("CA", 205L), ("CN", 217L), ("US", 586L)).prepended(("AU", 132L)))
    assert(res.length == 237)
  }

  test("n_airports_by_continent: max over union incl. default (air_routes.rs:732)") {
    assert(rows(
      """airports_by_continent[cont, count(code)] := *airport{code}, *contain[cont, code]
        |?[cont, max(count)] := *continent{code: cont}, airports_by_continent[cont, count]
        |?[cont, max(count)] := *continent{code: cont}, count = 0""".stripMargin)
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq(("AF", 326L), ("AN", 0L), ("AS", 972L), ("EU", 605L),
        ("NA", 994L), ("OC", 305L), ("SA", 339L)))
  }

  test("routes_per_airport with const ++ (air_routes.rs:758)") {
    assert(rows(
      """given[] <- [['A' ++ 'U' ++ 'S'],['AMS'],['JFK'],['DUB'],['MEX']]
        |?[code, count(code)] := given[code], *route{fr: code}""".stripMargin)
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq(("AMS", 283L), ("AUS", 98L), ("DUB", 185L), ("JFK", 204L), ("MEX", 116L)))
  }

  test("airports_by_route_number: collect (air_routes.rs:783)") {
    val r = rows(
      """route_count[fr, count(fr)] := *route{fr}
        |?[n, collect(code)] := route_count[code, n], n = 106;""".stripMargin)
    assert(r.length == 1)
    assert(r.head.head == 106L)
    assert(r.head(1).asInstanceOf[collection.Seq[_]].toSeq == Seq("TFS", "YVR"))
  }

  test("out_from_aus: nested collect of pairs (air_routes.rs:802)") {
    val r = rows(
      """out_by_runways[runways, count(code)] := *route{fr: 'AUS', to: code}, *airport{code, runways}
        |two_hops[count(a)] := *route{fr: 'AUS', to: a}, *route{fr: a}
        |?[max(total), collect(coll)] := two_hops[total], out_by_runways[n, ct], coll = [n, ct];""".stripMargin)
    assert(r.length == 1)
    assert(r.head.head == 8354L)
    assert(r.head(1).asInstanceOf[collection.Seq[collection.Seq[Long]]].map(_.toSeq).toSeq ==
      Seq(Seq(1L, 9L), Seq(2L, 24L), Seq(3L, 30L), Seq(4L, 24L), Seq(5L, 5L), Seq(6L, 4L), Seq(7L, 2L)))
  }

  test("const_return (air_routes.rs:826)") {
    assert(rows("?[name, count(code)] := *airport{code, region: 'US-OK'}, name = 'OK';") ==
      Seq(Seq("OK", 4L)))
  }

  test("multi_res: five parallel aggregates joined (air_routes.rs:844)") {
    assert(rows(
      """total[count(code)] := *airport{code}
        |high[count(code)] := *airport{code, runways}, runways >= 6
        |low[count(code)] := *airport{code, runways}, runways <= 2
        |four[count(code)] := *airport{code, runways}, runways == 4
        |france[count(code)] := *airport{code, country: 'FR'}
        |?[total, high, low, four, france] := total[total], high[high], low[low],
        |                                          four[four], france[france];""".stripMargin) ==
      Seq(Seq(3504L, 6L, 3204L, 53L, 59L)))
  }

  test("multi_unification: collect cap + var in rule-bound list (air_routes.rs:872)") {
    assert(rows(
      """target_airports[collect(code, 5)] := *airport{code}
        |?[a, count(a)] := target_airports[targets], a in targets, *route{fr: a}""".stripMargin)
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq(("AAA", 4L), ("AAE", 8L), ("AAL", 17L), ("AAN", 5L), ("AAQ", 11L)))
  }

  test("num_routes_from_eu_to_us: unique of pair lists + length (air_routes.rs:~920)") {
    assert(rows(
      """routes[unique(r)] := *contain['EU', fr],
        |                     *route{fr, to},
        |                     *airport{code: to, country: 'US'},
        |                     r = [fr, to]
        |?[n] := routes[rs], n = length(rs);""".stripMargin) == Seq(Seq(435)))
  }

  test("dijkstra with ending relation returns witness path (air_routes.rs:299)") {
    val r = db.run(
      """starting[] <- [['JFK']];
        |ending[] <- [['KUL']];
        |res[] <~ ShortestPathDijkstra(*route[], starting[], ending[]);
        |?[src, dst, cost, path] := res[src, dst, cost, path];""".stripMargin).collect()
    assert(r.length == 1)
    val path = r.head.getSeq[String](3)
    assert(path.head == "JFK" && path.last == "KUL")
    assert(r.head.getDouble(2) > 0)
  }

  test("yen k-shortest with ending relation (air_routes.rs:319)") {
    val r = db.run(
      """starting[] <- [['PEK']];
        |ending[] <- [['SIN']];
        |?[src, dst, rank, cost, path] <~ KShortestPathYen(*route[], starting[], ending[], k: 5);""".stripMargin)
      .orderBy("rank").collect()
    assert(r.length == 5)
    val costs = r.map(_.getDouble(3)).toSeq
    assert(costs == costs.sorted)
    r.foreach { row =>
      val p = row.getSeq[String](4)
      assert(p.head == "PEK" && p.last == "SIN")
    }
  }

  test("SCC fixed rule over routes groups PEK with LHR (air_routes.rs:236 shape)") {
    val scc = db.run(
      """r[fr, to] := *route{fr, to}
        |?[node, comp] <~ StronglyConnectedComponents(r[])""".stripMargin)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(scc("PEK") == scc("LHR")) // the main connected flight network is one SCC
    assert(scc.size == 3476) // 3504 airports - 28 with no routes (golden no_routes_airport)
  }
}
