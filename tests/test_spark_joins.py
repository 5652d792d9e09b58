"""Distributed join operators: region-region overlap join conformance."""


def test_rect_overlap_pairs_equals_bruteforce(spark):
    """Cover-cell candidate generation has exact recall: cover join +
    bbox verify == brute all-pairs bbox predicate, including boundary
    touches and a hot oversized rect overlapping many."""
    from buzzard_spark import synth
    from buzzard_spark.operators import spatial_join

    regions = synth.regions(spark, 120)
    got = {(r['id_a'], r['id_b']) for r in
           spatial_join.rect_overlap_pairs(regions, 4).collect()}
    rows = regions.collect()
    brute = set()
    for a in rows:
        for b in rows:
            if a['region_id'] < b['region_id'] and \
               a['minlat'] <= b['maxlat'] and b['minlat'] <= a['maxlat'] and \
               a['minlng'] <= b['maxlng'] and b['minlng'] <= a['maxlng']:
                brute.add((a['region_id'], b['region_id']))
    assert got == brute
    assert brute  # non-trivial: overlaps exist at this density
