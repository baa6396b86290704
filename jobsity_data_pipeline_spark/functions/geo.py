"""Geospatial column expressions: WKT POINT parsing and grid binning.

The reference stores coords as WKT strings (``POINT (lon lat)``,
trips.csv / create_objects.sql:3-5) and never parses them. For the
challenge's "group trips with similar origin/destination/time-of-day"
and bounding-box queries we parse them JVM-side with regexp expressions
(no Python UDF — stays inside whole-stage codegen) and bin to a grid.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WKT_POINT_RE = r"POINT\s*\(\s*(-?[0-9.]+)\s+(-?[0-9.]+)\s*\)"


def wkt_point_lon(col: Column | str) -> Column:
    """Longitude (x) of a ``POINT (lon lat)`` WKT string; null if malformed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, _WKT_POINT_RE, 1), F.lit("")).cast("double")


def wkt_point_lat(col: Column | str) -> Column:
    """Latitude (y) of a ``POINT (lon lat)`` WKT string; null if malformed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, _WKT_POINT_RE, 2), F.lit("")).cast("double")


def grid_cell(lon: Column, lat: Column, cell_deg: float = 0.05) -> Column:
    """Deterministic grid-cell id for proximity grouping.

    ``floor(coord / cell_deg)`` on both axes; trips whose endpoints land
    in the same cell are "similar" for the challenge's grouping
    requirement. Pure arithmetic -> codegen, and a groupBy on the cell
    id is a single hash shuffle at any scale.
    """
    gx = F.floor(lon / F.lit(cell_deg)).cast("long")
    gy = F.floor(lat / F.lit(cell_deg)).cast("long")
    return F.concat_ws(":", gx, gy)


def in_bbox(lon: Column, lat: Column, min_lon: float, min_lat: float,
            max_lon: float, max_lat: float) -> Column:
    """Bounding-box predicate (challenge: weekly avg for an area)."""
    return (
        (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
        & (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
    )


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard geohash of (lat, lon) at ``precision`` chars — pure
    column math, no UDF, so it stays inside whole-stage codegen.

    The textbook bisection is algebraically the binary expansion of the
    normalized coordinate: quantize each axis to its bit budget
    (ilon = floor((lon+180)/360·2^ceil(5p/2)), lat analogous), clamp
    the +90/+180 edge, interleave bits lon-first (geohash convention),
    and map each 5-bit group through the base-32 alphabet. Expression
    size is LINEAR in bit count — a naive per-bit bisection with
    chained conditionals grows a 2^bits expression tree, which is why
    it's re-derived here instead.

    Same-cell equality then powers proximity grouping/joins exactly
    like grid_cell, with the standard property that a k-char prefix is
    a containment hierarchy (coarser cell = shorter prefix).
    """
    total_bits = precision * 5
    lon_bits = (total_bits + 1) // 2  # lon gets the extra odd bit
    lat_bits = total_bits // 2
    ilon = F.least(
        F.floor((lon + 180.0) / 360.0 * (1 << lon_bits)),
        F.lit((1 << lon_bits) - 1),
    ).cast("long")
    ilat = F.least(
        F.floor((lat + 90.0) / 180.0 * (1 << lat_bits)),
        F.lit((1 << lat_bits) - 1),
    ).cast("long")
    one = F.lit(1).cast("long")
    # geohash bit i (MSB-first): even i -> lon, odd i -> lat
    z = F.lit(0).cast("long")
    for i in range(total_bits):
        if i % 2 == 0:
            src, nbits, j = ilon, lon_bits, i // 2
        else:
            src, nbits, j = ilat, lat_bits, i // 2
        bit = F.shiftright(src, nbits - 1 - j).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(bit, total_bits - 1 - i))
    letters = F.array(*[F.lit(c) for c in _GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            letters,
            (
                F.shiftright(z, total_bits - 5 * (g + 1))
                .bitwiseAND(F.lit(31).cast("long"))
                + 1
            ).cast("int"),
        )
        for g in range(precision)
    ]
    return F.concat(*chars)
