"""genson-style CLI over the Spark engine — flag-compatible with the
reference's ``genson-cli`` (/root/reference/genson-cli/src/main.rs:17-347).

Usage:
    python -m polars_genson_spark.cli [FLAGS] [FILE]

Reads FILE (or stdin) as one JSON document — or one per line with
``--ndjson`` — infers the merged schema, and prints it pretty-printed
(or Avro with ``--avro``); with ``--normalise`` prints the normalised
rows instead (one JSON line per row for NDJSON, else a pretty array).
``processed_count`` goes to stderr, exactly like the reference
(main.rs:272).

NOT the cluster path: like the reference CLI it is a single-file tool
that prints its whole result, so it collects rows to the driver — sized
for files a human inspects, not corpora. The distributed entry points
are ``python -m polars_genson_spark.jobs ...`` (validate/curate/
stream-validate/compact) and the library operators, which never collect
corpus-sized data.
"""

from __future__ import annotations

import dataclasses
import json
import sys

from .config import InferenceConfig, NormaliseConfig

HELP = """genson-spark CLI — infer/normalise JSON schemas on Spark

flags (reference-compatible):
  --ndjson                     one JSON document per input line
  --no-ignore-array            treat a top-level array as one value
  --avro                       emit an Avro schema
  --normalise                  print schema-normalised rows
  --coerce-strings             normalise: coerce "42" -> 42 etc.
  --keep-empty                 normalise: keep empty arrays/maps
  --map-encoding E             mapping|entries|kv (default mapping)
  --map-threshold N            min keys for map inference (default 20)
  --map-max-rk N               max required keys for map conversion
  --unify-maps                 unify compatible record values into maps
  --no-unify F1,F2             exclude fields from unification
  --force-type f:map|f:record  force a field's inferred type
  --force-parent-type f:T      force by parent field
  --force-scalar-promotion F   always wrap these scalar fields
  --no-wrap-scalars            disable scalar promotion
  --wrap-root NAME             wrap each doc as {NAME: doc}
  --root-map                   allow the root object to become a map
  FILE                         input path (default stdin)
"""


def parse_cli_args(
    args: list[str],
) -> tuple[InferenceConfig, NormaliseConfig, bool, str | None]:
    """Parse reference-compatible flags → (infer_cfg, norm_cfg, normalise?,
    input_path). 4-tuple wrapper kept for the snapshot replay tests;
    :func:`parse_cli_args_full` additionally returns ``--pq-column``."""
    cfg, norm, normalise, input_path, _pq = parse_cli_args_full(args)
    return cfg, norm, normalise, input_path


def parse_cli_args_full(
    args: list[str],
) -> tuple[InferenceConfig, NormaliseConfig, bool, str | None, str | None]:
    kw: dict = {}
    map_encoding = "mapping"  # CLI default (main.rs:29)
    coerce = False
    keep_empty = False
    normalise = False
    pq_column: str | None = None
    input_path: str | None = None
    i = 0

    def val(flag: str) -> str:
        # bounds-checked flag value: a flag given last crashed with a
        # raw IndexError instead of the reference's usage error
        if i + 1 >= len(args):
            raise SystemExit(f"Missing value for {flag}")
        return args[i + 1]

    def force_pair(flag: str) -> tuple[str, str]:
        v = val(flag)
        if ":" not in v:
            raise SystemExit(
                f"{flag} expects field:type, got {v!r}"
            )
        f, t = v.split(":", 1)
        return f, t

    while i < len(args):
        a = args[i]
        if a in ("--help", "-h"):
            print(HELP)
            raise SystemExit(0)
        elif a == "--map-threshold":
            kw["map_threshold"] = int(val(a)); i += 2
        elif a == "--unify-maps":
            kw["unify_maps"] = True; i += 1
        elif a == "--wrap-root":
            kw["wrap_root"] = val(a); i += 2
        elif a == "--ndjson":
            kw["ndjson"] = True; i += 1
        elif a in ("--map-max-required-keys", "--map-max-rk"):
            kw["map_max_required_keys"] = int(val(a)); i += 2
        elif a == "--no-unify":
            kw["no_unify"] = frozenset(val(a).split(",")); i += 2
        elif a == "--force-type":
            f, t = force_pair(a)
            kw.setdefault("force_field_types", {})[f] = t; i += 2
        elif a == "--force-parent-type":
            f, t = force_pair(a)
            kw.setdefault("force_parent_field_types", {})[f] = t; i += 2
        elif a == "--force-scalar-promotion":
            kw["force_scalar_promotion"] = frozenset(
                val(a).split(",")
            ); i += 2
        elif a == "--no-wrap-scalars":
            kw["wrap_scalars"] = False; i += 1
        elif a == "--root-map":
            kw["no_root_map"] = False; i += 1
        elif a == "--no-ignore-array":
            kw["ignore_outer_array"] = False; i += 1
        elif a == "--avro":
            kw["avro"] = True; i += 1
        elif a in ("--normalise", "--normalize"):
            normalise = True; i += 1
        elif a == "--coerce-strings":
            coerce = True; i += 1
        elif a == "--keep-empty":
            keep_empty = True; i += 1
        elif a == "--map-encoding":
            map_encoding = val(a)
            if map_encoding not in ("mapping", "entries", "kv"):
                # reject at the CLI boundary like the reference's enum
                # parse — not deep inside per-row normalisation after
                # Spark startup (or silently, if no map field exists)
                raise SystemExit(
                    f"invalid --map-encoding {map_encoding!r} "
                    "(mapping|entries|kv)"
                )
            i += 2
        elif a == "--pq-column":
            pq_column = val(a); i += 2
        elif a == "--max-builders":
            # reference memory knob (never output-affecting); the Spark
            # fold is O(summary) memory by construction — explicit no-op
            i += 2
        elif a in ("--debug", "--profile", "--verbose"):
            i += 1  # reference diagnostics; no-ops here
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag: {a}")
        else:
            input_path = a; i += 1
    cfg = InferenceConfig(**kw)
    norm = NormaliseConfig(
        empty_as_null=not keep_empty,
        coerce_string=coerce,
        map_encoding=map_encoding,
        wrap_root=cfg.wrap_root,
    )
    return cfg, norm, normalise, input_path, pq_column


def main(argv: list[str] | None = None) -> int:
    from .operators.infer import infer_json_schema
    from .functions.normalise import normalise_document
    from .session import get_spark

    cfg, norm, normalise, input_path, pq_column = parse_cli_args_full(
        list(sys.argv[1:] if argv is None else argv)
    )

    spark = get_spark(app_name="genson-spark-cli")
    try:
        if pq_column is not None:
            # parquet mode (main.rs:199-213): read the string column; with
            # --ndjson each line becomes its own entry (processed_count
            # counts lines, like the reference's flat_map)
            if input_path is None:
                raise SystemExit("--pq-column requires an input file path")
            pq = spark.read.parquet(input_path).select(pq_column)
            cells = [r[0] for r in pq.collect()]
            if cfg.ndjson:
                cells = [
                    line for c in cells if c
                    for line in c.splitlines() if line.strip()
                ]
            text = None  # parquet mode: `cells` is the document list
            rows = [(c,) for c in cells]
            df = spark.createDataFrame(rows, "doc string")
        else:
            text = (
                open(input_path).read() if input_path else sys.stdin.read()
            )
            df = spark.createDataFrame([(text,)], "doc string")
        if normalise:
            acfg = dataclasses.replace(cfg, avro=True)
            res = infer_json_schema(df, "doc", acfg)
            if pq_column is not None:
                # iterate the `cells` list already on the driver (a
                # re-collect of df rebuilt the identical list)
                docs = []
                for c in cells:
                    try:
                        docs.append(json.loads(c) if c else None)
                    except ValueError:
                        docs.append(None)  # main.rs:238 unwrap_or(Null)
            elif cfg.ndjson:
                docs = [
                    json.loads(l) for l in text.splitlines() if l.strip()
                ]
            else:
                # regular JSON is ONE value, array or not (main.rs:247):
                # splitting a top-level array normalised each element
                # against the whole-file schema — wrong under
                # --no-ignore-array (double scalar-wrap) and --wrap-root
                # (elements wrapped instead of the array)
                try:
                    docs = [json.loads(text)]
                except ValueError:
                    docs = [None]  # unwrap_or(Null), like the reference
            rows = [normalise_document(d, res.schema, norm) for d in docs]
            # ensure_ascii=False throughout: the reference's serde output
            # is raw UTF-8, not \uXXXX escapes
            if cfg.ndjson:
                for r in rows:
                    print(json.dumps(r, separators=(",", ":"),
                                     ensure_ascii=False))
            else:
                print(json.dumps(rows, indent=2, ensure_ascii=False))
        else:
            res = infer_json_schema(df, "doc", cfg)
            print(json.dumps(res.schema, indent=2, ensure_ascii=False))
        print(f"Processed {res.processed_count} documents", file=sys.stderr)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
