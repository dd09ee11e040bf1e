"""Routes-file reader (reference S7/S8/F6).

The reference reads job manifests — JSON RoutesFiles of shape
``{"config": {...}, "routes": {"<group>": [{"name", "relation_id",
"skip"}...]}}`` (pkg/routes/types.go:7-16, schema/routefile.schema.json)
— from a local path (scripts/validate/main.go:54-75) or an S3 prefix
listing (cmd/trigger/main.go:86-151). Spark's native globbing replaces
the S3 pagination loop: pass a directory/glob and every file becomes
rows of one work-list DataFrame.

Rows with ``relation_id < 1`` or ``skip`` are dropped (F6,
scripts/validate/main.go:82-84; cmd/trigger/main.go:143-147).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_pt_validator_spark.config import ValidationConfig

WORKLIST_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("relation_id", T.LongType(), False),
        T.StructField("skip", T.BooleanType(), False),
    ]
)


class RoutesFileError(ValueError):
    """A routes manifest violates schema/routefile.schema.json.

    Carries every problem found across every file (``problems``), not
    just the first — a malformed work list should fail the job loudly
    and completely, the error channel the reference gets implicitly
    from Go's typed JSON unmarshalling."""

    def __init__(self, problems: list[str]):
        self.problems = problems
        super().__init__(
            f"{len(problems)} routes-file schema violation(s):\n  "
            + "\n  ".join(problems)
        )


_CONFIG_KEYS = {
    # schema/routefile.schema.json:10-29 — the four config properties
    "naptanPlatformTags": bool,
    "minimumNodeMembers": (int, float),
    "ignoreTraversalDirectionWays": list,
    "minimumRouteVariants": (int, float),
}


def validate_routes_doc(doc: object, source: str) -> list[str]:
    """Schema-contract check of one parsed manifest
    (schema/routefile.schema.json:33-64): required top-level `routes`,
    no unknown top-level/config/route keys, typed config values, and
    per-route required `name` (string) + `relation_id` (number),
    optional `comment` (string) / `skip` (boolean). Returns human-
    readable problems; empty list = valid."""
    errs: list[str] = []
    if not isinstance(doc, dict):
        return [f"{source}: top level must be an object"]
    for k in doc:
        if k not in ("config", "routes"):
            errs.append(f"{source}: unknown top-level key {k!r}")
    if "routes" not in doc:
        errs.append(f"{source}: missing required key 'routes'")
    cfg = doc.get("config", {})
    if cfg is not None and not isinstance(cfg, dict):
        errs.append(f"{source}: 'config' must be an object")
    elif cfg:
        for k, v in cfg.items():
            want = _CONFIG_KEYS.get(k)
            if want is None:
                errs.append(f"{source}: unknown config key {k!r}")
            elif want is bool and not isinstance(v, bool):
                errs.append(f"{source}: config.{k} must be a boolean")
            elif want is list and (
                not isinstance(v, list)
                or any(isinstance(x, bool) or not isinstance(x, (int, float)) for x in v)
            ):
                errs.append(f"{source}: config.{k} must be an array of numbers")
            elif want == (int, float) and (
                isinstance(v, bool) or not isinstance(v, (int, float))
            ):
                errs.append(f"{source}: config.{k} must be a number")
    routes = doc.get("routes")
    if routes is not None and not isinstance(routes, dict):
        errs.append(f"{source}: 'routes' must be an object of groups")
    elif isinstance(routes, dict):
        for group, entries in routes.items():
            if not isinstance(entries, list):
                errs.append(f"{source}: routes[{group!r}] must be an array")
                continue
            for i, r in enumerate(entries):
                where = f"{source}: routes[{group!r}][{i}]"
                errs.extend(f"{where}{p}" for p in _entry_problems(r))
    return errs


def _entry_problems(r: object) -> list[str]:
    """Problems for ONE route entry (schema/routefile.schema.json:38-61)
    — shared by the whole-file validator and the non-strict row loop so
    'malformed' means the same thing on both paths."""
    if not isinstance(r, dict):
        return [" must be an object"]
    errs = []
    for k in r:
        if k not in ("name", "relation_id", "comment", "skip"):
            errs.append(f": unknown key {k!r}")
    if not isinstance(r.get("name"), str):
        errs.append(": 'name' is required and must be a string")
    rid = r.get("relation_id")
    if isinstance(rid, bool) or not isinstance(rid, (int, float)):
        errs.append(": 'relation_id' is required and must be a number")
    if "comment" in r and not isinstance(r["comment"], str):
        errs.append(": 'comment' must be a string")
    if "skip" in r and not isinstance(r["skip"], bool):
        errs.append(": 'skip' must be a boolean")
    return errs


def parse_config(raw: dict) -> ValidationConfig:
    """JSON config block -> ValidationConfig (config.go:3-13 keys)."""
    return ValidationConfig(
        naptan_platform_tags=bool(raw.get("naptanPlatformTags", False)),
        minimum_node_members=int(raw.get("minimumNodeMembers", 0)),
        ignore_traversal_direction_ways=tuple(
            raw.get("ignoreTraversalDirectionWays", []) or []
        ),
        minimum_route_variants=int(raw.get("minimumRouteVariants", 0)),
    )


def read_routes_files(
    spark: SparkSession, path_or_glob: str, strict: bool = True
) -> tuple[DataFrame, dict[str, ValidationConfig]]:
    """Read one or many RoutesFiles.

    Returns (work-list DataFrame filtered per F6, {source_file:
    ValidationConfig}). The manifest files are small (driver-side
    parse is correct here — they're job *descriptions*, not data;
    the reference's trigger lambda does the same S3-side).

    Every manifest is checked against the schema contract first
    (validate_routes_doc); by default a violation raises
    RoutesFileError enumerating every problem in every file — a typo'd
    manifest must fail the job, not silently null-filter rows (the
    behaviour Go's typed unmarshalling gives the reference). Pass
    strict=False to instead drop malformed route entries after the
    problems are reported on stderr.
    """
    import sys

    if os.path.isdir(path_or_glob):
        paths = sorted(glob.glob(os.path.join(path_or_glob, "**", "*.json"), recursive=True))
    else:
        paths = sorted(glob.glob(path_or_glob))
    rows: list[tuple] = []
    configs: dict[str, ValidationConfig] = {}
    problems: list[str] = []
    docs: list[tuple[str, dict]] = []
    for p in paths:
        with open(p) as f:
            try:
                doc = json.load(f)
            except json.JSONDecodeError as exc:
                problems.append(f"{p}: not valid JSON ({exc})")
                continue
        problems.extend(validate_routes_doc(doc, p))
        docs.append((p, doc if isinstance(doc, dict) else {}))
    if problems:
        if strict:
            raise RoutesFileError(problems)
        print(
            f"routes_file: dropping {len(problems)} malformed entr(ies):\n  "
            + "\n  ".join(problems),
            file=sys.stderr,
        )
    for p, doc in docs:
        try:
            configs[p] = parse_config(doc.get("config", {}) or {})
        except (TypeError, ValueError):
            # only reachable in non-strict mode (strict raised above);
            # the problem was already reported — degrade to defaults
            configs[p] = ValidationConfig()
        routes = doc.get("routes", {})
        if not isinstance(routes, dict):
            continue
        for group, entries in routes.items():
            if not isinstance(entries, list):
                continue
            for r in entries:
                if _entry_problems(r):
                    continue  # non-strict: reported above, dropped here
                rows.append(
                    (
                        p,
                        group,
                        r["name"],
                        int(r["relation_id"]),
                        bool(r.get("skip", False)),
                    )
                )
    df = spark.createDataFrame(rows, WORKLIST_SCHEMA)
    return df.filter((F.col("relation_id") >= 1) & ~F.col("skip")), configs


def parent_relations(relations: DataFrame) -> DataFrame:
    """S2 — GetRelationRelations (osm.go:82-114) as a set operation:
    (relation_id, parent_relation_id) for every relation-type
    membership, i.e. the member->parent edge list reversed."""
    return (
        relations.select(
            F.col("relation_id").alias("parent_relation_id"),
            F.explode("members").alias("m"),
        )
        .filter(F.col("m.type") == "relation")
        .select(F.col("m.ref").alias("relation_id"), "parent_relation_id")
    )
