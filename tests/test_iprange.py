"""IP-range bucket-decomposition join: exact boundary semantics vs a
brute-force between-join, including bucket-edge and bucket-spanning
ranges."""


def test_ip_range_join_matches_bruteforce(spark):
    from pyproj_spark.operators.iprange import ip_range_join

    ranges = [
        (0, 65535, "a"),            # exactly one /16 bucket
        (65536, 65536, "b"),        # single-address range at bucket edge
        (100000, 400000, "c"),      # spans multiple buckets
        (2**31, 2**31 + 10, "d"),   # high half
    ]
    rdf = spark.createDataFrame(ranges, ["start", "end", "country"])
    probes = [0, 65535, 65536, 65537, 99999, 100000, 250000, 400000,
              400001, 2**31 - 1, 2**31, 2**31 + 10, 2**31 + 11,
              2**32 - 1]
    pdf = spark.createDataFrame(
        [(i, ip) for i, ip in enumerate(probes)], ["pid", "ip32"])
    got = (ip_range_join(pdf, rdf, ["pid"]).toPandas()
           .set_index("pid").sort_index())

    for i, ip in enumerate(probes):
        exp = next((c for s, e, c in ranges if s <= ip <= e), None)
        assert got.loc[i, "country"] == exp or (
            exp is None and got.loc[i, "country"] is None), (ip, exp)
