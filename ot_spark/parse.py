"""Coordinate extraction from web-page columns (graft north_star).

The reference reads coordinates straight off Node structs
(src/handler/info.rs:112); the graft must *parse* them out of
``url`` / ``text`` / ``html``.  All three extractors are JVM-side
``regexp_extract`` column expressions — vectorized inside whole-stage
codegen, strictly faster than any Python/Arrow UDF, and the scan only
reads the columns actually referenced (column pruning).

Source priority: url path > text body > html meta — first hit wins
(``coalesce``).  The ``text`` column itself is NEVER rewritten (the
byte-identical-text invariant from BASELINE.json): extraction only reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# https://host/geo/<lat>,<lon>/slug — synth embeds %.7f, accept any decimal.
# ONE capturing group per pattern holding the whole "lat<sep>lon" pair: the
# regex engine runs ONCE per (row, source); lat/lon split off the captured
# pair with substring_index (plain byte scans).  The two-group form ran the
# same regex twice per source — group-1 for lat, group-2 for lon — i.e. up
# to six regex executions per row (guide §1.2 step 2: per-task work).
URL_GEO_RE = r"/geo/(-?\d+(?:\.\d+)?,-?\d+(?:\.\d+)?)"
# "coords: <lat>, <lon>" in body text
TEXT_GEO_RE = r"coords:\s*(-?\d+(?:\.\d+)?,\s*-?\d+(?:\.\d+)?)"
# <meta name="geo.position" content="lat;lon">
HTML_GEO_RE = r'geo\.position"\s+content="(-?\d+(?:\.\d+)?;-?\d+(?:\.\d+)?)"'


def _extract_pair(
    col: Column, pattern: str, guard: str, sep: str
) -> tuple[Column, Column]:
    """Regex gated behind a cheap substring test (``contains`` is ~10x
    cheaper than the regex engine, and most rows miss most sources); the
    single captured "lat<sep>lon" pair splits on ``sep``.  cast(double)
    trims surrounding whitespace, so the optional post-comma spaces the
    old group-2 pattern absorbed parse identically."""
    pair = F.when(col.contains(guard), F.regexp_extract(col, pattern, 1))
    pair = F.when(pair != "", pair)
    return (
        F.substring_index(pair, sep, 1).cast("double"),
        F.substring_index(pair, sep, -1).cast("double"),
    )


def lat_lon_from_url(url: Column) -> tuple[Column, Column]:
    return _extract_pair(url, URL_GEO_RE, "/geo/", ",")


def lat_lon_from_text(text: Column) -> tuple[Column, Column]:
    return _extract_pair(text, TEXT_GEO_RE, "coords:", ",")


def lat_lon_from_html(html: Column) -> tuple[Column, Column]:
    return _extract_pair(F.decode(html, "UTF-8"), HTML_GEO_RE, "geo.position", ";")


def with_coordinates(df: DataFrame) -> DataFrame:
    """Add ``lat``/``lon`` doubles, NULL when no source has coordinates."""
    u_lat, u_lon = lat_lon_from_url(F.col("url"))
    t_lat, t_lon = lat_lon_from_text(F.col("text"))
    h_lat, h_lon = lat_lon_from_html(F.col("html"))
    return df.withColumns(
        {
            "lat": F.coalesce(u_lat, t_lat, h_lat),
            "lon": F.coalesce(u_lon, t_lon, h_lon),
        }
    )
