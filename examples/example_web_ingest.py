# example_web_ingest.py — the crawl-to-corpus chain (beyond reference)
"""The web-ingest pipeline a crawl-derived training corpus runs, composed
from the round-9 operators end to end on a synthetic mini-crawl:

1. WARC ingest (``sources/warc.py``) — parse stored gzip crawl shards
   (one gzip member per record, the Common Crawl layout);
2. charset ladder (``operators/encoding.py``) — BOM / strict UTF-8 /
   cp1252 / latin-1, total over any byte string;
3. robots compliance (``operators/robots.py``) — retroactively drop
   pages the host's robots.txt disallows;
4. HTML -> text (``operators/html.py``) — entities, script/style
   removal, block-break normalization, link counts;
5. link graph + anchor text (``operators/linkgraph.py``) — host edge
   list and degrees, the PageRank input;
6. sitemap coverage (``operators/sitemap.py``) — which declared URLs
   did the compliant crawl actually capture?

Parsing runs in Arrow kernels; every aggregation is a plain groupBy —
the shapes that scale by adding executors.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.encoding import detect_decode_text
from bid_evaluation_spark.operators.html import extract_html_features
from bid_evaluation_spark.operators.linkgraph import (
    extract_links, host_degrees, host_graph)
from bid_evaluation_spark.operators.robots import robots_filter
from bid_evaluation_spark.operators.sitemap import (
    sitemap_entries, write_urlset)
from bid_evaluation_spark.session import get_spark
from bid_evaluation_spark.sources.warc import encode_warc, read_warc

spark = get_spark("example-web-ingest", master="local[4]",
                  shuffle_partitions=4)

# -- 1. a tiny stored crawl: one gzip WARC shard, three captured pages --
PAGES = {
    "http://a.example/":          ('<a href="http://b.example/x">partner'
                                   '</a><a href="/private/p">hidden</a>'
                                   "<p>home page</p>").encode(),
    "http://a.example/private/p": b"<p>dropped by robots later</p>",
    # cp1252 body: the charset ladder must label + decode it
    "http://b.example/x":         ('<a href="//a.example/">back home</a>'
                                   "<p>caf\xe9 content</p>"
                                   ).encode("cp1252"),
}
shard_bytes = encode_warc(
    [{"type": "response", "url": u, "payload": body}
     for u, body in PAGES.items()], compress=True)
tmp = tempfile.mkdtemp(prefix="web_ingest_")
with open(os.path.join(tmp, "shard-000.warc.gz"), "wb") as fh:
    fh.write(shard_bytes)

records = read_warc(spark, os.path.join(tmp, "*.warc.gz"))
print("-- WARC records --")
records.select("url", "http_status", "n_bytes").show(truncate=False)

# give each record an id and carry the url along
recs = records.select(
    F.monotonically_increasing_id().alias("doc_id"), "url", "payload")

# -- 2. bytes -> text through the charset ladder ------------------------
decoded = detect_decode_text(recs, payload_col="payload").join(
    recs.select("doc_id", "url"), "doc_id")
print("-- charset labels --")
decoded.select("url", "encoding", "n_bytes").show(truncate=False)

# -- 3. robots compliance (a.example disallows /private/) ---------------
ROBOTS = {"a.example": "User-agent: *\nDisallow: /private/\n",
          "b.example": "User-agent: *\nAllow: /\n"}
robots_df = spark.createDataFrame(list(ROBOTS.items()),
                                  "host string, robots_txt string")
with_host = decoded.withColumn(
    "host", F.lower(F.regexp_extract("url", r"^https?://([^/]+)", 1)))
verdicts = robots_filter(
    with_host.join(F.broadcast(robots_df), "host", "left"))
pages = (decoded.join(verdicts, "doc_id")
         .filter(F.col("allowed")))
print(f"-- robots: kept {pages.count()} of {decoded.count()} pages --")

# -- 4. HTML -> text ----------------------------------------------------
texts = extract_html_features(pages, html_col="text").join(
    pages.select("doc_id", "url"), "doc_id")
print("-- extracted text --")
texts.select("url", "text", "n_links").show(truncate=False)

# -- 5. link graph ------------------------------------------------------
links = extract_links(pages, url_col="url", html_col="text")
print("-- anchors (with text) --")
links.select("src_host", "dst_host", "anchor_text", "nofollow") \
     .show(truncate=False)
print("-- host graph + degrees --")
g = host_graph(links)
g.show()
host_degrees(g).orderBy("host").show()

# -- 6. sitemap coverage: declared vs captured --------------------------
sm = write_urlset([{"loc": "http://a.example/", "priority": 1.0},
                   {"loc": "http://a.example/new-page"},
                   {"loc": "http://a.example/private/p"}])
sitemaps = spark.createDataFrame([(1, sm)],
                                 "sitemap_id long, payload binary")
declared = sitemap_entries(sitemaps).select(F.col("loc").alias("url"))
coverage = (declared.join(pages.select("url").distinct()
                          .withColumn("captured", F.lit(True)),
                          "url", "left")
            .select("url", F.coalesce("captured", F.lit(False))
                    .alias("captured")))
print("-- sitemap coverage (declared URLs vs compliant crawl) --")
coverage.orderBy("url").show(truncate=False)

spark.stop()
print("web-ingest example done")
