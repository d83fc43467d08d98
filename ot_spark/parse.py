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

# https://host/geo/<lat>,<lon>/slug — synth embeds %.7f, accept any decimal
URL_GEO_RE = r"/geo/(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"
# "coords: <lat>, <lon>" in body text
TEXT_GEO_RE = r"coords:\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)"
# <meta name="geo.position" content="lat;lon">
HTML_GEO_RE = r'geo\.position"\s+content="(-?\d+(?:\.\d+)?);(-?\d+(?:\.\d+)?)"'


def _extract(col: Column, pattern: str, group: int, guard: str) -> Column:
    """Regex gated behind a cheap substring test: ``contains`` is ~10x
    cheaper than the regex engine, and most rows miss most sources."""
    raw = F.when(col.contains(guard), F.regexp_extract(col, pattern, group))
    return F.when(raw != "", raw.cast("double"))


def lat_lon_from_url(url: Column) -> tuple[Column, Column]:
    return (
        _extract(url, URL_GEO_RE, 1, "/geo/"),
        _extract(url, URL_GEO_RE, 2, "/geo/"),
    )


def lat_lon_from_text(text: Column) -> tuple[Column, Column]:
    return (
        _extract(text, TEXT_GEO_RE, 1, "coords:"),
        _extract(text, TEXT_GEO_RE, 2, "coords:"),
    )


def lat_lon_from_html(html: Column) -> tuple[Column, Column]:
    decoded = F.decode(html, "UTF-8")
    return (
        _extract(decoded, HTML_GEO_RE, 1, "geo.position"),
        _extract(decoded, HTML_GEO_RE, 2, "geo.position"),
    )


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
