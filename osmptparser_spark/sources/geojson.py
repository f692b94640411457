"""GeoJSON sink (S4): reference-shape feature serialization.

Reproduces the reference's JSON shapes (relation.rs:340-401) as pure
Catalyst ``to_json(struct(...))`` expressions — including the verbatim
quirk that PublicTransport declares ``"type": "LineString"`` while
nesting multi-linestring coordinates (relation.rs:378-381), and Area
declares ``"Polygon"`` with its ring list (relation.rs:353-356).

Key-order note: the reference serializes tag/info HashMaps in Rust's
nondeterministic iteration order; this engine emits map entries in
Spark's map order (canonical for a given plan), which is a documented
determinism improvement, not a semantic change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _coords(geometry: Column) -> Column:
    # ARRAY<ARRAY<STRUCT<lon,lat>>> -> ARRAY<ARRAY<ARRAY<DOUBLE>>>
    return F.transform(
        geometry,
        lambda seg: F.transform(seg, lambda p: F.array(p["lon"], p["lat"])),
    )


def public_transport_geojson(df: DataFrame) -> DataFrame:
    """One GeoJSON FeatureCollection string per route (bin.rs:52-62)."""
    feature_line = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("LineString").alias("type"),
            _coords(F.col("geometry")).alias("coordinates"),
        ).alias("geometry"),
    )
    stops_fc = F.struct(
        F.lit("FeatureCollection").alias("type"),
        F.transform(
            F.col("stops"),
            lambda s: F.struct(
                F.lit("Feature").alias("type"),
                F.struct(s["id"].alias("id"), s["tags"].alias("tags")).alias(
                    "properties"
                ),
                F.struct(
                    F.lit("Point").alias("type"),
                    F.array(s["lon"], s["lat"]).alias("coordinates"),
                ).alias("geometry"),
            ),
        ).alias("features"),
    )
    # the features array is heterogeneous (a Feature + a nested
    # FeatureCollection); Spark arrays are homogeneous, so serialize the
    # two members separately and splice the JSON strings
    line_json = F.to_json(feature_line)
    stops_json = F.to_json(stops_fc)
    props_json = F.to_json(
        F.struct(
            F.col("id").alias("id"),
            F.col("tags").alias("tags"),
            F.col("info").alias("info"),
            F.struct(
                F.col("status_code").alias("code"),
                F.col("status_detail").alias("detail"),
            ).alias("parse_status"),
        )
    )
    geojson = F.concat(
        F.lit('{"type":"FeatureCollection","properties":'),
        props_json,
        F.lit(',"features":['),
        line_json,
        F.lit(","),
        stops_json,
        F.lit("]}"),
    )
    return df.select(F.col("id"), geojson.alias("geojson"))


def area_geojson(df: DataFrame) -> DataFrame:
    """One GeoJSON Feature string per area (bin.rs:66-83), with the
    F5 output filter applied (status==0 and non-empty geometry)."""
    filtered = df.filter((F.col("status_code") == 0) & (F.size("geometry") > 0))
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.col("id").alias("id"),
            F.col("id_type").alias("id_type"),
            F.col("tags").alias("tags"),
            F.col("info").alias("info"),
            F.struct(
                F.col("status_code").alias("code"),
                F.col("status_detail").alias("detail"),
            ).alias("parse_status"),
        ).alias("properties"),
        F.struct(
            F.lit("Polygon").alias("type"),
            _coords(F.col("geometry")).alias("coordinates"),
        ).alias("geometry"),
    )
    return filtered.select(F.col("id"), F.to_json(feature).alias("geojson"))


def write_geojson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: one feature JSON per line (ndjson — the scalable form
    of the reference's stdout array print)."""
    df.select("geojson").write.mode(mode).text(path)
