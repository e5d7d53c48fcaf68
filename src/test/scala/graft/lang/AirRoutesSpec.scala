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

  test("num_routes_in_us_airports_from_eu (air_routes.rs:937)") {
    val res = rows(
      """?[to, count(to)] := *contain['EU', fr], *route{fr, to}, *airport{code: to, country: 'US'}
        |:order count(to)""".stripMargin).map(r => (r.head, r(1)))
    assert(res.length == 45)
    assert(res.toMap == Map() ++ res.toMap) // shape sanity
    val m = res.toMap
    assert(m("JFK") == 42L && m("EWR") == 43L && m("MIA") == 28L && m("ANC") == 1L)
    assert(res.last._1 == "EWR") // largest count last
  }

  test("routes_from_eu_to_us_starting_with_l (air_routes.rs:966)") {
    val res = rows(
      """?[eu_code, us_code] := *contain['EU', eu_code],
        |                       starts_with(eu_code, 'L'),
        |                       *route{fr: eu_code, to: us_code},
        |                       *airport{code: us_code, country: 'US'}""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted
    assert(res.length == 53)
    assert(res.head == ("LGW", "AUS") && res.last == ("LIS", "SFO"))
    assert(res.count(_._1 == "LHR") == 30)
  }

  test("len_of_names_count (air_routes.rs:1003)") {
    assert(rows(
      """?[sum(n)] := *route{fr: 'AUS', to},
        |             *airport{code: to, city},
        |             n = length(city)""".stripMargin).head.head == 891L)
  }

  test("group_count_by_out with zero default (air_routes.rs:1028)") {
    assert(rows(
      """route_count[count(fr), fr] := *route{fr}
        |rc[max(n), a] := route_count[n, a]
        |rc[max(n), a] := *airport{code: a}, n = 0
        |?[n, count(a)] := rc[n, a]
        |:order n;
        |:limit 10;""".stripMargin).map(r => (r.head, r(1))) ==
      Seq((0L, 29L), (1L, 777L), (2L, 649L), (3L, 357L), (4L, 234L),
        (5L, 149L), (6L, 140L), (7L, 100L), (8L, 73L), (9L, 64L)))
  }

  test("mean_group_count with or-branch default (air_routes.rs:1056)") {
    val v = rows(
      """route_count[count(fr), fr] := *route{fr};
        |rc[max(n), a] := route_count[n, a] or (*airport{code: a}, n = 0);
        |?[mean(n)] := rc[n, _];""".stripMargin).head.head.asInstanceOf[Double]
    assert(math.abs(v - 14.451198630136986) < 1e-8)
  }

  test("n_routes_from_london_uk (air_routes.rs:1078)") {
    assert(rows(
      "?[code, count(code)] := *airport{code, city: 'London', region: 'GB-ENG'}, *route{fr: code}")
      .map(r => (r.head, r(1))).sortBy(_._1.toString) ==
      Seq(("LCY", 51L), ("LGW", 232L), ("LHR", 221L), ("LTN", 130L), ("STN", 211L)))
  }

  test("reachable_from_london_uk_in_two_hops (air_routes.rs:1103)") {
    assert(rows(
      """lon_uk_airports[code] := *airport{code, city: 'London', region: 'GB-ENG'}
        |one_hop[to] := lon_uk_airports[fr], *route{fr, to}, not lon_uk_airports[to];
        |?[count_unique(a3)] := one_hop[a2], *route{fr: a2, to: a3}, not lon_uk_airports[a3];""".stripMargin) ==
      Seq(Seq(2353L)))
  }

  test("routes_within_england (air_routes.rs:1125)") {
    val res = rows(
      """eng_aps[code] := *airport{code, region: 'GB-ENG'}
        |?[fr, to] := eng_aps[fr], *route{fr, to}, eng_aps[to]""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted
    assert(res.length == 54)
    assert(res.take(4) == Seq(("BHX", "NCL"), ("BRS", "NCL"), ("EMA", "SOU"), ("EXT", "ISC")))
    assert(res.last == ("SOU", "NCL"))
  }

  test("routes_within_england_no_dup via sorted pairs (air_routes.rs:1157)") {
    val res = rows(
      """eng_aps[code] := *airport{code, region: 'GB-ENG'}
        |?[pair] := eng_aps[fr], *route{fr, to}, eng_aps[to], pair = sorted([fr, to]);""".stripMargin)
      .map(_.head.asInstanceOf[collection.Seq[String]].toSeq)
    assert(res.length == 27)
    assert(res.map(_.mkString("-")).sorted.head == "BHX-NCL")
  }

  test("hard_route_finding: choice through recursion terminates (air_routes.rs:1188)") {
    val r = rows(
      """reachable[to, choice(p)] := *route{fr: 'AUS', to}, to != 'YYZ', p = ['AUS', to];
        |reachable[to, choice(p)] := reachable[b, prev], *route{fr: b, to},
        |                            to != 'YYZ', p = append(prev, to)
        |?[p] := reachable['YPO', p]
        |:limit 1;""".stripMargin)
    assert(r.length == 1)
    val p = r.head.head.asInstanceOf[collection.Seq[String]].toSeq
    // the reference's exact witness depends on its insertion order; ours
    // is the deterministic smallest first-round candidate — both are
    // valid AUS→…→YPO paths avoiding YYZ
    assert(p.head == "AUS" && p.last == "YPO" && !p.contains("YYZ"))
  }

  test("na_from_india with is_in filter (air_routes.rs:1217)") {
    assert(rows(
      """?[ind_a, na_a] := *airport{code: ind_a, country: 'IN'},
        |                  *route{fr: ind_a, to: na_a},
        |                  *airport{code: na_a, country},
        |                  country in ['US', 'CA']""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted ==
      Seq(("BOM", "EWR"), ("BOM", "JFK"), ("BOM", "YYZ"), ("DEL", "EWR"), ("DEL", "IAD"),
        ("DEL", "JFK"), ("DEL", "ORD"), ("DEL", "SFO"), ("DEL", "YVR"), ("DEL", "YYZ")))
  }

  test("eu_cities_reachable_from_fll (air_routes.rs:1246)") {
    assert(rows("?[city] := *route{fr: 'FLL', to}, *contain['EU', to], *airport{code: to, city}")
      .map(_.head.toString).sorted ==
      Seq("Barcelona", "Copenhagen", "London", "Madrid", "Oslo", "Paris", "Stockholm"))
  }

  test("clt_to_eu_or_sa: unify-in over containment (air_routes.rs:1270)") {
    assert(rows("?[to] := *route{fr: 'CLT', to}, c_name in ['EU', 'SA'], *contain[c_name, to]")
      .map(_.head.toString).sorted ==
      Seq("BCN", "CDG", "DUB", "FCO", "FRA", "GIG", "GRU", "LHR", "MAD", "MUC"))
  }

  test("london_to_us seeded by a literal list (air_routes.rs:1294)") {
    val res = rows(
      """?[fr, to] := fr in ['LHR', 'LCY', 'LGW', 'LTN', 'STN'],
        |             *route{fr, to}, *airport{code: to, country: 'US'}""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted
    assert(res.length == 48)
    assert(res.head == ("LGW", "AUS") && res.last == ("STN", "SFB"))
  }

  test("tx_to_ny (air_routes.rs:1326)") {
    assert(rows(
      """?[fr, to] := *airport{code: fr, region: 'US-TX'},
        |             *route{fr, to}, *airport{code: to, region: 'US-NY'}""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted ==
      Seq(("AUS", "BUF"), ("AUS", "EWR"), ("AUS", "JFK"), ("DAL", "LGA"), ("DFW", "BUF"),
        ("DFW", "EWR"), ("DFW", "JFK"), ("DFW", "LGA"), ("HOU", "EWR"), ("HOU", "JFK"),
        ("HOU", "LGA"), ("IAH", "EWR"), ("IAH", "JFK"), ("IAH", "LGA"), ("SAT", "EWR"),
        ("SAT", "JFK")))
  }

  test("denver_to_mexico (air_routes.rs:1353)") {
    assert(rows("?[city] := *route{fr: 'DEN', to}, *airport{code: to, country: 'MX', city}")
      .map(_.head.toString).sorted ==
      Seq("Cancun", "Cozumel", "Guadalajara", "Mexico City", "Monterrey",
        "Puerto Vallarta", "San José del Cabo"))
  }

  test("three_cities cross routes (air_routes.rs:1377)") {
    val res = rows(
      """three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        |?[s, d] := three[s], *route{fr: s, to: d}, three[d]""".stripMargin)
      .map(r => (r.head.toString, r(1).toString)).sorted
    assert(res.length == 27)
    assert(res.head == ("CDG", "LCY") && res.last == ("STN", "MUC"))
  }

  test("long_distance_from_lgw (air_routes.rs:1407)") {
    val res = rows(
      """?[city, dist] := *route{fr: 'LGW', to, dist},
        |                 dist > 4000, *airport{code: to, city}""".stripMargin)
      .map(r => (r.head.toString, r(1).asInstanceOf[Double]))
    assert(res.length == 42)
    val m = res.toMap
    assert(m("Austin") == 4921.0 && m("Singapore") == 6751.0 && m("Buenos Aires") == 6908.0)
  }

  test("long_routes_one_dir (air_routes.rs:1441)") {
    val res = rows("?[fr, dist, to] := *route{fr, to, dist}, dist > 8000, fr < to;")
      .map(r => (r.head.toString, r(1).asInstanceOf[Double], r(2).toString)).sortBy(x => (x._1, x._2))
    assert(res.length == 32)
    assert(res.head == ("AKL", 8186.0, "ORD"))
    assert(res.contains(("EWR", 9523.0, "SIN")) && res.contains(("JFK", 9526.0, "SIN")))
  }

  test("longest_routes sorted desc (air_routes.rs:1476)") {
    assert(rows(
      """?[fr, dist, to] := *route{fr, to, dist}, dist > 4000, fr < to;
        |:sort -dist;
        |:limit 20;""".stripMargin)
      .map(r => (r.head.toString, r(1).asInstanceOf[Double], r(2).toString)).take(6) ==
      Seq(("JFK", 9526.0, "SIN"), ("EWR", 9523.0, "SIN"), ("AKL", 9025.0, "DOH"),
        ("LHR", 9009.0, "PER"), ("PEK", 8884.0, "PTY"), ("AKL", 8818.0, "DXB")))
  }

  test("longest_routes_from_each_airports: max + choice per group (air_routes.rs:1517)") {
    assert(rows(
      """?[fr, max(dist), choice(to)] := *route{fr, dist, to}
        |:sort fr
        |:limit 10;""".stripMargin)
      .map(r => (r.head.toString, r(1).asInstanceOf[Double], r(2).toString)) ==
      Seq(("AAA", 968.0, "FAC"), ("AAE", 1161.0, "ALG"), ("AAL", 1693.0, "AAR"),
        ("AAN", 1613.0, "CAI"), ("AAQ", 2122.0, "BAX"), ("AAR", 1585.0, "AAL"),
        ("AAT", 267.0, "URC"), ("AAX", 69.0, "POJ"), ("AAY", 531.0, "SAH"),
        ("ABA", 2096.0, "DME")))
  }

  test("total_distance_from_three_cities (air_routes.rs:1545)") {
    assert(rows(
      """three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        |?[sum(dist)] := three[a], *route{fr: a, dist}""".stripMargin).head.head == 2739039.0)
  }

  test("total_distance_within_three_cities (air_routes.rs:1567)") {
    assert(rows(
      """three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
        |?[sum(dist)] := three[a], *route{fr: a, dist, to}, three[to]""".stripMargin)
      .head.head == 10282.0)
  }

  test("specific_distance point lookup (air_routes.rs:1589)") {
    assert(rows("?[dist] := *route{fr: 'AUS', to: 'MEX', dist}") == Seq(Seq(748.0)))
  }

  test("n_routes_between with range and containment (air_routes.rs:1609)") {
    assert(rows(
      """us_a[a] := *contain['US', a]
        |?[count(fr)] := *route{fr, to, dist}, dist >= 100, dist <= 200,
        |                us_a[fr], us_a[to]""".stripMargin) == Seq(Seq(597L)))
  }

  test("one_stop_distance arithmetic join (air_routes.rs:1632)") {
    assert(rows(
      """?[code, dist] := *route{fr: 'AUS', to: code, dist: dis1},
        |                 *route{fr: code, to: 'LHR', dist: dis2},
        |                 dist = dis1 + dis2
        |:order dist;
        |:limit 10;""".stripMargin).map(r => (r.head.toString, r(1).asInstanceOf[Double])) ==
      Seq(("DTW", 4893.0), ("YYZ", 4901.0), ("ORD", 4912.0), ("PIT", 4916.0), ("BNA", 4923.0),
        ("DFW", 4926.0), ("BOS", 4944.0), ("EWR", 4953.0), ("IAD", 4959.0), ("JFK", 4960.0)))
  }

  test("airport_most_routes sorted by aggregate display column (air_routes.rs:1660)") {
    assert(rows(
      """?[fr, count(fr)] := *route{fr}
        |:order -count(fr);
        |:limit 10;""".stripMargin).map(r => (r.head.toString, r(1))) ==
      Seq(("FRA", 310L), ("IST", 309L), ("CDG", 293L), ("AMS", 283L), ("MUC", 270L),
        ("ORD", 265L), ("DFW", 253L), ("DXB", 248L), ("PEK", 248L), ("ATL", 242L)))
  }

  test("north_of_77 (air_routes.rs:1687)") {
    assert(rows("?[city, latitude] := *airport{lat, city}, lat > 77, latitude = round(lat)")
      .map(r => (r.head.toString, r(1).asInstanceOf[Double])).sorted ==
      Seq(("Longyearbyen", 78.0), ("Qaanaaq", 77.0)))
  }

  test("greenwich_meridian (air_routes.rs:1708)") {
    assert(rows("?[code] := *airport{lon, code}, lon > -0.1, lon < 0.1")
      .map(_.head.toString).sorted == Seq("CDT", "LCY", "LDE", "LEH"))
  }

  test("box_around_heathrow (air_routes.rs:1728)") {
    assert(rows(
      """h_box[lon, lat] := *airport{code: 'LHR', lon, lat}
        |?[code] := h_box[lhr_lon, lhr_lat], *airport{code, lon, lat},
        |            abs(lhr_lon - lon) < 1, abs(lhr_lat - lat) < 1""".stripMargin)
      .map(_.head.toString).sorted == Seq("LCY", "LGW", "LHR", "LTN", "SOU", "STN"))
  }

  test("dfw_by_region: collect per group (air_routes.rs:1753)") {
    val res = rows(
      """?[region, collect(to)] := *route{fr: 'DFW', to},
        |                          *airport{code: to, country: 'US', region},
        |                          region in ['US-CA', 'US-TX', 'US-FL', 'US-CO', 'US-IL']""".stripMargin)
      .map(r => r.head.toString -> r(1).asInstanceOf[collection.Seq[String]].toSeq.sorted).toMap
    assert(res("US-CO") == Seq("ASE", "COS", "DEN", "DRO", "EGE", "GJT", "GUC", "HDN", "MTJ"))
    assert(res("US-IL") == Seq("BMI", "CMI", "MLI", "ORD", "PIA", "SPI"))
    assert(res("US-CA").length == 14 && res("US-TX").length == 23 && res("US-FL").length == 14)
  }

  test("great_circle_distance via haversine_deg_input (air_routes.rs:1790)") {
    assert(rows(
      """?[deg_diff] := *airport{code: 'SFO', lat: a_lat, lon: a_lon},
        |               *airport{code: 'NRT', lat: b_lat, lon: b_lon},
        |                deg_diff = round(haversine_deg_input(a_lat, a_lon, b_lat, b_lon));""".stripMargin) ==
      Seq(Seq(1.0)))
  }

  test("aus_to_edi: shortest through recursion (air_routes.rs:1812)") {
    val r = rows(
      """us_uk_airports[code] := *airport{code, country: 'UK'}
        |us_uk_airports[code] := *airport{code, country: 'US'}
        |routes[to, shortest(path)] := *route{fr: 'AUS', to}, us_uk_airports[to],
        |                                path = ['AUS', to];
        |routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
        |                                us_uk_airports[to],
        |                                path = append(prev, to);
        |?[path] := routes['EDI', path];""".stripMargin)
    assert(r.length == 1)
    assert(r.head.head.asInstanceOf[collection.Seq[String]].toSeq == Seq("AUS", "BOS", "EDI"))
  }

  test("reachable_from_lhr: shortest-path lengths over the whole graph (air_routes.rs:1842)") {
    val res = rows(
      """routes[to, shortest(path)] := *route{fr: 'LHR', to},
        |                              path = ['LHR', to];
        |routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
        |                              path = append(prev, to);
        |?[len, path] := routes[_, path], len = length(path);
        |:order -len;
        |:limit 10;""".stripMargin)
    assert(res.length == 10)
    // the unique depth-8 endpoint: LHR→…→YPO through the James Bay chain
    assert(res.head.head == 8)
    assert(res.head(1).asInstanceOf[collection.Seq[String]].toSeq ==
      Seq("LHR", "YYZ", "YTS", "YMO", "YFA", "ZKE", "YAT", "YPO"))
    assert(res.tail.forall(_.head == 7))
  }

  test("bfs with a goal condition returns a witness path (air_routes.rs:212)") {
    val r = db.run(
      """starting[] <- [['PEK']]
        |?[start, goal, path] <~ BFS(*route[], *airport[code], starting[], condition: (code == 'LHR'))""".stripMargin)
      .collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "PEK" && r.head.getString(1) == "LHR")
    val p = r.head.getSeq[String](2)
    assert(p.head == "PEK" && p.last == "LHR" && p.length <= 3) // PEK→LHR is direct or 1 stop
  }

  test("dfs with a goal condition returns a preorder path (air_routes.rs:155)") {
    val r = db.run(
      """starting[] <- [['PEK']]
        |?[start, goal, path] <~ DFS(*route[], *airport[code], starting[], condition: (code == 'LHR'))""".stripMargin)
      .collect()
    assert(r.length == 1)
    val p = r.head.getSeq[String](2)
    assert(p.head == "PEK" && p.last == "LHR")
  }

  test("astar with coordinate heuristic relations (air_routes.rs:268 shape)") {
    val r = db.run(
      """code_lat_lon[code, lat, lon] := *airport{code, lat, lon}
        |starting[code, lat, lon] := code = 'HFE', *airport{code, lat, lon};
        |goal[code, lat, lon] := code = 'LHR', *airport{code, lat, lon};
        |?[src, dst, cost, path] <~ ShortestPathAStar(*route[], code_lat_lon[node, lat1, lon1], starting[], goal[g, lat2, lon2])""".stripMargin)
      .collect()
    assert(r.length == 1)
    val p = r.head.getSeq[String](3)
    assert(p.head == "HFE" && p.last == "LHR" && r.head.getDouble(2) > 0)
  }

  test("deg_centrality fixed rule ranks FRA first (air_routes.rs:281)") {
    val r = db.run(
      """deg_centrality[node, total, out, in] <~ DegreeCentrality(*route[a, b]);
        |?[node, total, out, in] := deg_centrality[node, total, out, in];
        |:order -total;
        |:limit 3;""".stripMargin).collect()
    assert(r.head.getString(0) == "FRA" && r.head.getLong(1) == 620L)
  }

  test("SCC fixed rule over routes groups PEK with LHR (air_routes.rs:236 shape)") {
    val scc = db.run(
      """r[fr, to] := *route{fr, to}
        |?[node, comp] <~ StronglyConnectedComponents(r[])""".stripMargin)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(scc("PEK") == scc("LHR")) // the main connected flight network is one SCC
    assert(scc.size == 3476) // 3504 airports - 28 with no routes (golden no_routes_airport)
  }

  test("cc fixed rule groups PEK with LHR (air_routes.rs:252 shape)") {
    val cc = db.run(
      """r[fr, to] := *route{fr, to}
        |?[node, comp] <~ ConnectedComponents(r[])""".stripMargin)
      .collect().map(x => x.getString(0) -> x.get(1)).toMap
    assert(cc("PEK") == cc("LHR"))
    assert(cc.size == 3476)
  }

  test("empty: arity-mismatched const row errors (air_routes.rs:178)") {
    intercept[Exception](db.run("?[id, name] <- [[]]").collect())
  }

  test("most_out_routes_again: aggregation in first head position (air_routes.rs:507)") {
    assert(rows(
      """route_count[count(fr), fr] := *route{fr};
        |?[code, n] := route_count[n, code], n > 180;
        |:sort -n;""".stripMargin).map(r => (r.head, r(1))) ==
      Seq(("FRA", 310L), ("IST", 309L), ("CDG", 293L), ("AMS", 283L), ("MUC", 270L),
        ("ORD", 265L), ("DFW", 253L), ("DXB", 248L), ("PEK", 248L), ("ATL", 242L),
        ("DME", 232L), ("LGW", 232L), ("LHR", 221L), ("DEN", 217L), ("MAN", 216L),
        ("LAX", 214L), ("PVG", 213L), ("STN", 211L), ("MAD", 206L), ("VIE", 206L),
        ("JFK", 204L), ("BCN", 203L), ("EWR", 203L), ("BER", 202L), ("FCO", 201L),
        ("DUS", 199L), ("IAH", 199L), ("MIA", 196L), ("YYZ", 195L), ("BRU", 194L),
        ("CPH", 194L), ("DOH", 187L), ("DUB", 185L), ("CLT", 184L), ("SVO", 181L)))
  }

  test("num_airports_in_us_with_routes_from_eu (air_routes.rs:917)") {
    assert(rows(
      """?[count_unique(to)] := *contain['EU', fr],
        |                       *route{fr, to},
        |                       *airport{code: to, country: 'US'}""".stripMargin) ==
      Seq(Seq(45L)))
  }

  test("furthest_from_lhr: min_cost meet recursion over [path, dist] pairs (air_routes.rs:1882)") {
    val out = rows(
      """routes[to, min_cost(cost_pair)] := *route{fr: 'LHR', to, dist},
        |                                     path = ['LHR', to],
        |                                     cost_pair = [path, dist];
        |routes[to, min_cost(cost_pair)] := routes[a, prev], *route{fr: a, to, dist},
        |                                   path = append(first(prev), to),
        |                                   cost_pair = [path, last(prev) + dist];
        |?[cost, path] := routes[dst, cost_pair], cost = last(cost_pair), path = first(cost_pair);
        |:order -cost;
        |:limit 10;""".stripMargin)
      .map(r => (r.head.asInstanceOf[Double], r(1).asInstanceOf[scala.collection.Seq[String]].toList))
    assert(out == Seq(
      (12922.0, Seq("LHR", "JNB", "HLE", "ASI", "BZZ")),
      (12093.0, Seq("LHR", "PVG", "CHC", "IVC")),
      (12015.0, Seq("LHR", "NRT", "AKL", "WLG", "TIU")),
      (12009.0, Seq("LHR", "PVG", "CHC", "DUD")),
      (11910.0, Seq("LHR", "NRT", "AKL", "WLG", "WSZ")),
      (11900.0, Seq("LHR", "PVG", "CHC", "HKK")),
      (11805.0, Seq("LHR", "PVG", "CHC")),
      (11766.0, Seq("LHR", "PVG", "BNE", "ZQN")),
      (11758.0, Seq("LHR", "NRT", "AKL", "BHE")),
      (11751.0, Seq("LHR", "NRT", "AKL", "NSN"))))
  }

  test("skip_limit (air_routes.rs:1921; limit-without-sort row choice is engine-defined)") {
    def q(suffix: String) = rows(s"?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]\n$suffix")
      .map(_.head.asInstanceOf[Long])
    val domain = Set(3L, 4L, 5L, 6L, 7L, 8L, 9L)
    assert(q("").sorted == Seq(3L, 4L, 5L, 6L, 7L, 8L, 9L)) // set semantics dedup
    // the reference's exact rows under :limit reflect its sequential
    // insertion-order limiter (eval.rs QueryLimiter); ours are
    // whichever `limit` rows Spark returns — counts and membership are
    // the portable contract
    assert(q(":limit 2").length == 2 && q(":limit 2").forall(domain))
    val off = q(":limit 2\n:offset 1")
    assert(off.length == 2 && off.forall(domain))
    assert(q(":limit 100\n:offset 1").length == 6)
  }
}
