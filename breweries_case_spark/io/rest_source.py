"""Paginated REST API source (SURVEY §2.1 S1).

Re-expresses the reference's ingest loop (reference
``breweries_bronze_processors.py:59-125``: page loop until empty/partial
page or page cap; retry with exponential backoff on 429/5xx honoring
Retry-After) as a pluggable source:

- ``fetch_paginated`` drives any ``page_fetcher(page, per_page) ->
  list[dict]`` — injecting the fetcher makes the source mockable exactly
  the way the reference's tests mock HTTP, and lets ``q_ingest_rest`` run
  deterministically offline.
- ``http_page_fetcher`` builds the real HTTP fetcher (requests with a
  urllib3 Retry if available, stdlib urllib otherwise — import-gated).

Scale note: a driver-side page loop is correct for API-bounded ingest
(the API itself caps throughput; reference ceiling is 10k rows/run). For
bulk backfills the engine reads staged payload files with
``spark.read.json`` instead — fan-out belongs in the storage layer, not
against a rate-limited API."""

from __future__ import annotations

import datetime as _dt
import json
import time
from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PageFetcher = Callable[[int, int], list[dict]]

DEFAULT_PER_PAGE = 200
DEFAULT_MAX_PAGES = 50  # reference cap: 50 pages x 200 rows
DEFAULT_RETRIES = 5
DEFAULT_BACKOFF = 0.6
RETRY_STATUSES = (429, 500, 502, 503, 504)


def fetch_paginated(
    page_fetcher: PageFetcher,
    per_page: int = DEFAULT_PER_PAGE,
    max_pages: int = DEFAULT_MAX_PAGES,
) -> list[dict]:
    """Loop pages until an empty or partial page, or the page cap."""
    records: list[dict] = []
    for page in range(1, max_pages + 1):
        batch = page_fetcher(page, per_page)
        if not batch:
            break
        records.extend(batch)
        if len(batch) < per_page:
            break
    return records


class RetryableHTTPError(Exception):
    def __init__(self, status: int, retry_after: float | None = None):
        super().__init__(f"HTTP {status}")
        self.status = status
        self.retry_after = retry_after


def with_retries(
    call: Callable[[], list[dict]],
    retries: int = DEFAULT_RETRIES,
    backoff: float = DEFAULT_BACKOFF,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """Exponential backoff on retryable statuses, honoring Retry-After."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return call()
        except RetryableHTTPError as exc:
            last = exc
            if attempt == retries:
                break
            delay = exc.retry_after if exc.retry_after else backoff * (2**attempt)
            sleep(delay)
    raise last  # type: ignore[misc]


def http_page_fetcher(
    base_url: str,
    timeout: tuple[float, float] = (5.0, 30.0),
    retries: int = DEFAULT_RETRIES,
    backoff: float = DEFAULT_BACKOFF,
) -> PageFetcher:
    """Real HTTP fetcher (requests if importable, stdlib otherwise)."""
    try:
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3.util.retry import Retry

        session = requests.Session()
        retry = Retry(
            total=retries,
            backoff_factor=backoff,
            status_forcelist=list(RETRY_STATUSES),
            respect_retry_after_header=True,
        )
        session.mount("https://", HTTPAdapter(max_retries=retry))
        session.mount("http://", HTTPAdapter(max_retries=retry))

        def fetch(page: int, per_page: int) -> list[dict]:
            resp = session.get(
                base_url,
                params={"page": page, "per_page": per_page},
                timeout=timeout,
            )
            resp.raise_for_status()
            return resp.json()

        return fetch
    except ImportError:  # pragma: no cover - requests is present in CI
        from urllib.error import HTTPError
        from urllib.request import urlopen

        def fetch_once(page: int, per_page: int) -> list[dict]:
            url = f"{base_url}?page={page}&per_page={per_page}"
            try:
                with urlopen(url, timeout=timeout[1]) as resp:
                    return json.loads(resp.read())
            except HTTPError as exc:
                if exc.code in RETRY_STATUSES:
                    ra = exc.headers.get("Retry-After") if exc.headers else None
                    raise RetryableHTTPError(
                        exc.code, float(ra) if ra else None
                    ) from exc
                raise

        def fetch(page: int, per_page: int) -> list[dict]:
            # same retry contract as the requests path (module docstring)
            return with_retries(
                lambda: fetch_once(page, per_page), retries=retries, backoff=backoff
            )

        return fetch


# --- deterministic offline source for the registry --------------------------


def synthetic_page_fetcher(total_rows: int = 450) -> PageFetcher:
    """Deterministic brewery-shaped pages — the offline stand-in wired into
    ``q_ingest_rest`` so the source machinery (pagination loop, partial-page
    stop, bronze conversion) runs without network."""
    types = ["micro", "nano", "regional", "brewpub", "large", "planning"]

    def fetch(page: int, per_page: int) -> list[dict]:
        start = (page - 1) * per_page
        end = min(start + per_page, total_rows)
        return [
            {
                "id": f"brewery-{i:05d}",
                "name": f"Synthetic Brewery {i}",
                "brewery_type": types[i % 6],
                "city": f"City{i % 10}",
                "state_province": f"State{i % 5}",
                "postal_code": f"{90000 + i}",
                "country": "United States",
                "longitude": f"-122.{i:04d}",
                "latitude": f"45.{i % 10000:04d}",
                "phone": f"555-{i:04d}",
                "website_url": None,
            }
            for i in range(start, end)
        ]

    return fetch


def q_ingest_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ingest entry: paginated fetch (synthetic fetcher —
    deterministic, offline) → bronze rows. The same call with
    ``http_page_fetcher(url)`` is the production path. Oracle-backed:
    the payload is a pure function of the row index, so DuckDB
    regenerates all 450 rows and the exact json.dumps rendering — the
    pagination loop (page boundaries, partial-page stop) and the bronze
    serializer are value-checked, not just row-counted."""
    from breweries_case_spark.pipelines.medallion import ingest_to_bronze

    records = fetch_paginated(synthetic_page_fetcher(), per_page=200)
    return ingest_to_bronze(spark, records, _dt.date(2024, 1, 15))


def ingest_staged_files(
    spark: SparkSession,
    path: str,
    schema,
    file_format: str = "json",
    **options,
) -> DataFrame:
    """Bulk-backfill source: read staged payload files (JSON lines or CSV)
    with an EXPLICIT schema — the distributed counterpart of the REST page
    loop (reference ingests ≤10k rows/run over HTTP; backfills arrive as
    files). Explicit schema is non-negotiable at scale: schema inference
    is a full extra pass over the data, and drift should surface as NULLs
    in declared columns (the bronze ELT stance), not as a mutated table
    schema. At 100 TB this is just a parquet-style scan — splittable,
    predicate-pushable (CSV/JSON: column pruning only), massively
    parallel."""
    if file_format not in ("json", "csv", "orc"):
        raise ValueError(f"unsupported staged format {file_format!r}")
    reader = spark.read.schema(schema)
    if file_format == "csv":
        reader = reader.option("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(file_format).load(path)


def ingest_staged_json_quarantine(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """Staged JSON ingest with a QUARANTINE lane: malformed lines land in
    a side output instead of aborting the job (FAILFAST) or silently
    vanishing (DROPMALFORMED). Returns (good, bad): ``good`` has the
    declared schema; ``bad`` carries the raw offending line for replay
    after the producer is fixed — the bronze-layer contract for dirty
    backfills.

    Implementation: PERMISSIVE mode + columnNameOfCorruptRecord. Spark
    refuses to filter on the corrupt column of an uncached JSON relation
    (it is populated only while parsing other columns), so the parsed
    batch is persisted first — the batch was about to be materialized
    into bronze anyway, so this adds no extra pass at scale."""
    from pyspark.sql.types import StringType, StructField, StructType

    corrupt = "_corrupt_record"
    qschema = StructType(
        list(schema.fields) + [StructField(corrupt, StringType(), True)]
    )
    parsed = (
        spark.read.schema(qschema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = parsed.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return good, bad


def _staging_dir() -> str:
    """Per-run staging directory that OUTLIVES the DataFrames reading from
    it (removed at interpreter exit, not at function return) — so staged
    reads stay lazy and distributed instead of being collected to dodge a
    temp-dir lifetime. In production this is an object-store prefix with a
    retention policy; the lifecycle contract (staging outlives the query
    plan that scans it) is the same."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="breweries_staged_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def q_ingest_staged_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered staged-file ingest (oracle-backed — DuckDB regenerates
    the index-deterministic payload and the exact to_json rendering):
    stage the synthetic brewery pages as JSON lines, bulk-read them back
    with the declared payload schema, and land bronze rows FULLY DISTRIBUTED — the payload →
    raw_json re-serialization runs as to_json on the executors and the
    returned frame is a lazy scan of the staged files; nothing round-trips
    the driver. The backfill twin of q_ingest_rest, same downstream
    contract. (to_json drops null fields where driver-side json.dumps would
    keep them; silver's from_json lands absent fields as NULL either way.)"""
    from pyspark.sql import functions as F

    from breweries_case_spark.schemas import BREWERY_PAYLOAD_SCHEMA

    records = fetch_paginated(synthetic_page_fetcher(), per_page=200)
    staging = _staging_dir()
    with open(f"{staging}/payload.jsonl", "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    staged = ingest_staged_files(
        spark, staging, BREWERY_PAYLOAD_SCHEMA, file_format="json"
    )
    return staged.select(
        F.to_json(F.struct(*staged.columns)).alias("raw_json"),
        F.lit(_dt.date(2024, 1, 15)).alias("extraction_date"),
    )


def q_ingest_staged_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV twin of q_ingest_staged_json (oracle-backed, same oracle —
    the null conventions below make both formats yield identical bronze
    rows): the same synthetic pages staged as headered CSV, read back
    with the declared schema, same distributed bronze conversion. CSV cannot represent JSON's null-vs-
    absent distinction (nulls land as empty strings unless nullValue is
    declared) — the reader sets nullValue='' so both staged formats yield
    identical bronze rows, which the unit test asserts."""
    import csv

    from pyspark.sql import functions as F

    from breweries_case_spark.schemas import BREWERY_PAYLOAD_SCHEMA

    records = fetch_paginated(synthetic_page_fetcher(), per_page=200)
    staging = _staging_dir()
    fields = [f.name for f in BREWERY_PAYLOAD_SCHEMA.fields]
    with open(f"{staging}/payload.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fields)
        w.writeheader()
        for r in records:
            w.writerow({k: ("" if r.get(k) is None else r.get(k)) for k in fields})
    staged = ingest_staged_files(
        spark,
        staging,
        BREWERY_PAYLOAD_SCHEMA,
        file_format="csv",
        nullValue="",
    )
    return staged.select(
        F.to_json(F.struct(*staged.columns)).alias("raw_json"),
        F.lit(_dt.date(2024, 1, 15)).alias("extraction_date"),
    )


def q_ingest_staged_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC staged ingest (oracle-backed): write ``supplier`` to ORC with
    Spark's native writer (a distributed write — one file per partition),
    read it back through ``ingest_staged_files`` with the declared schema,
    and project. ORC is the third staged format beside JSON/CSV and the
    only columnar one: splittable stripes, predicate pushdown, and column
    pruning all work, so a backfill landing as ORC scans like parquet at
    100 TB. Values survive the round trip bit-exact — decimals keep scale,
    strings keep bytes — which is what lets a plain-SQL DuckDB oracle over
    the SOURCE table check the staged copy: any write- or read-side
    corruption breaks the hash."""
    from breweries_case_spark.io.reader import load_table

    src = load_table(spark, sf_dir, "supplier")
    staging = _staging_dir()
    path = f"{staging}/supplier_orc"
    src.write.mode("overwrite").orc(path)
    staged = ingest_staged_files(spark, path, src.schema, file_format="orc")
    return staged.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


def _staged_roundtrip(
    spark: SparkSession, sf_dir: str, file_format: str, **reader_opts
) -> DataFrame:
    """Shared write→stage→read-back body for the oracle-backed JSON/CSV
    round-trip twins (the q_ingest_staged_orc pattern): write ``supplier``
    with Spark's native distributed writer, bulk-read the staged files
    back through ``ingest_staged_files`` with the declared schema, and
    project. Both text formats round-trip this schema bit-exactly —
    doubles serialize as shortest-repr decimal (which re-parses to the
    identical bits), longs/ints/strings trivially — so a plain-SQL
    oracle over the SOURCE table value-checks the staged copy; any
    write- or read-side corruption breaks the hash."""
    from breweries_case_spark.io.reader import load_table

    src = load_table(spark, sf_dir, "supplier")
    staging = _staging_dir()
    path = f"{staging}/supplier_{file_format}"
    writer = src.write.mode("overwrite")
    if file_format == "csv":
        # header on: the staged-file reader parses headered CSV
        writer = writer.option("header", True)
    getattr(writer, file_format)(path)
    staged = ingest_staged_files(
        spark, path, src.schema, file_format=file_format, **reader_opts
    )
    return staged.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


def q_ingest_staged_json_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle-backed JSON-lines staged ingest: the distributed
    write+read-back twin of q_ingest_staged_json (which stages the
    synthetic brewery payload and so can only be unit-checked). Same
    reader path, value-checked end to end against the source table."""
    return _staged_roundtrip(spark, sf_dir, "json")


def q_ingest_staged_csv_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle-backed headered-CSV staged ingest (the
    q_ingest_staged_csv value-checked twin). ``nullValue=''`` mirrors
    the payload twin's null convention; the source has no empty strings,
    so the round trip is lossless here (the empty-vs-null collapse is
    the documented CSV format limit, asserted by the payload twin's
    unit test)."""
    # header handling lives in _staged_roundtrip (writer) and
    # ingest_staged_files (reader) — only the null convention is
    # caller-chosen here
    return _staged_roundtrip(spark, sf_dir, "csv", nullValue="")


def q_ingest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution staged read — the drift path every long-lived
    lake table hits: batch 1 lands WITHOUT s_nationkey (an old producer),
    batch 2 lands WITHOUT s_acctbal (the column was dropped) and WITH
    s_nationkey (added). Reading the parent dir with
    ``mergeSchema=true`` + a ``batch`` partition dir yields the UNION
    schema with per-batch NULLs for absent columns — drift surfaces as
    NULLs in declared columns (the bronze ELT stance,
    ``ingest_staged_files`` docstring), never as a failed read or a
    silently narrowed schema. Each batch is a distributed parquet write;
    the merged read stays a plain splittable scan (schema merging is a
    footer-only planning cost, paid once per job, not per row)."""
    from breweries_case_spark.io.reader import load_table

    src = load_table(spark, sf_dir, "supplier")
    staging = _staging_dir()
    root = f"{staging}/supplier_evolving"
    src.select("s_suppkey", "s_name", "s_acctbal").write.mode(
        "overwrite"
    ).parquet(f"{root}/batch=1")
    src.select("s_suppkey", "s_name", "s_nationkey").write.mode(
        "overwrite"
    ).parquet(f"{root}/batch=2")
    merged = (
        spark.read.option("mergeSchema", True)
        .option("basePath", root)
        .parquet(root)
    )
    return merged.select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey", "batch"
    )


#: PII redaction patterns — deliberately plain ANSI regex (no
#: lookaround, no engine-specific classes) so Spark's Java regex and
#: DuckDB's RE2 match the SAME spans; ordered email → SSN → phone
#: because an SSN contains a phone-shaped tail
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN_RE = r"\d{3}-\d{2}-\d{4}"
PII_PHONE_RE = r"\d{3}-\d{4}"


def pii_scrub_expr(c):
    """Composable PII redaction over any string column: emails →
    ``[EMAIL]``, SSNs → ``[SSN]``, then phone-shaped digit runs →
    ``[PHONE]`` (in that order — the SSN pattern contains a
    phone-shaped tail, so phones are redacted last from the already
    email/SSN-clean text). A pure ``regexp_replace`` chain — JVM
    codegen, no UDF — usable anywhere a text column flows (compose it
    before the gate → dedup → mix chain exactly like
    ``training_mix.quality_mask``)."""
    c = F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, PII_SSN_RE, "[SSN]")
    return F.regexp_replace(c, PII_PHONE_RE, "[PHONE]")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern SCRUB over the staged-ingest payloads — the
    curation pass the reference's own data-quality doc calls for
    (docs/data_quality.md) and every pretraining pipeline runs before
    text leaves bronze: redact emails, SSNs, and phone numbers, and
    publish per-record redaction counts (the audit trail a privacy
    review reads). The documents fixture has no digits/emails, so the
    PII carrier is the synthetic REST payload (the fixture path that
    ships phone numbers): each record's contact blob is rebuilt
    deterministically from the payload fields — name, a synthesized
    ``<id>@breweries.example`` address, the ``555-xxxx`` phone, and an
    index-derived SSN — then scrubbed with ``pii_scrub_expr``.

    Output (id, contact_blob, scrubbed, n_emails, n_ssns, n_phones);
    each count is measured on the text its replace actually sees —
    SSN hits on the email-redacted text, phone hits on the
    email+SSN-redacted text — so the three counts partition the
    redacted spans even when an SSN/phone-shaped span sits inside an
    email match (digits+dashes are legal in an email local part).
    Full value oracle: the blob
    is a pure function of the row index, so DuckDB regenerates it and
    applies the same regex chain (RE2 vs Java regex agree on these
    deliberately plain patterns) — the scrubber itself is
    value-checked, not just row-counted.

    Scale: scan-shaped (no exchange) — regexp_replace/regexp_count run
    inside whole-stage codegen on whatever partitioning the payload
    arrives with; at 100 TB this rides the bronze ingest scan."""
    records = fetch_paginated(synthetic_page_fetcher(), per_page=200)
    rows = [(r["id"], r["name"], r["phone"]) for r in records]
    base = spark.createDataFrame(
        rows, "id string, name string, phone string"
    )
    blob = F.concat(
        F.lit("Contact "),
        F.col("name"),
        F.lit(" <"),
        F.col("id"),
        F.lit("@breweries.example>, tel "),
        F.col("phone"),
        F.lit(", owner SSN 123-45-"),
        F.substring(F.col("phone"), 5, 4),
        F.lit("."),
    )
    no_email = F.regexp_replace(blob, PII_EMAIL_RE, "[EMAIL]")
    no_ssn = F.regexp_replace(no_email, PII_SSN_RE, "[SSN]")
    return base.select(
        "id",
        blob.alias("contact_blob"),
        pii_scrub_expr(blob).alias("scrubbed"),
        F.regexp_count(blob, F.lit(PII_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(no_email, F.lit(PII_SSN_RE)).cast("long").alias("n_ssns"),
        F.regexp_count(no_ssn, F.lit(PII_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
    )


QUERIES = {
    "q_ingest_rest": q_ingest_rest,
    "q_pii_scrub": q_pii_scrub,
    "q_ingest_schema_evolution": q_ingest_schema_evolution,
    "q_ingest_staged_json": q_ingest_staged_json,
    "q_ingest_staged_csv": q_ingest_staged_csv,
    "q_ingest_staged_orc": q_ingest_staged_orc,
    "q_ingest_staged_json_roundtrip": q_ingest_staged_json_roundtrip,
    "q_ingest_staged_csv_roundtrip": q_ingest_staged_csv_roundtrip,
}
_ROUNDTRIP_ORACLE = """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    """
# The synthetic payload is a pure function of the row index, so the
# ingest ids get FULL value oracles: DuckDB regenerates the 450 rows
# from generate_series and renders raw_json exactly the way each path
# serializes it. Two renderings exist by design and both are pinned:
# - driver-side json.dumps (q_ingest_rest): ", "/": " separators, null
#   fields KEPT ("website_url": null), dict insertion order;
# - executor-side to_json (staged json/csv): compact separators, null
#   fields DROPPED (address_1, website_url), struct-schema field order.
# Any drift in the pagination loop (missing/duplicated page), the
# staging writer, the schema'd reader, or the serializer breaks the
# value hash — this is a stronger check than the old rows-only status.
_SYN_FIELDS = """
        SELECT i,
               printf('brewery-%05d', i) AS id,
               'Synthetic Brewery ' || i AS name,
               (['micro','nano','regional','brewpub','large','planning'])[i % 6 + 1]
                   AS brewery_type,
               'City' || (i % 10) AS city,
               'State' || (i % 5) AS state_province,
               CAST(90000 + i AS VARCHAR) AS postal_code,
               printf('-122.%04d', i) AS longitude,
               printf('45.%04d', i) AS latitude,
               printf('555-%04d', i) AS phone
        FROM generate_series(0, 449) AS t(i)
    """
_STAGED_JSON_ORACLE = f"""
        WITH syn AS ({_SYN_FIELDS})
        SELECT '{{"id":"' || id || '","name":"' || name
               || '","brewery_type":"' || brewery_type
               || '","city":"' || city
               || '","state_province":"' || state_province
               || '","postal_code":"' || postal_code
               || '","country":"United States","longitude":"' || longitude
               || '","latitude":"' || latitude
               || '","phone":"' || phone || '"}}' AS raw_json,
               DATE '2024-01-15' AS extraction_date
        FROM syn
    """
ORACLES: dict[str, str] = {
    "q_ingest_staged_orc": _ROUNDTRIP_ORACLE,
    "q_ingest_staged_json_roundtrip": _ROUNDTRIP_ORACLE,
    "q_ingest_staged_csv_roundtrip": _ROUNDTRIP_ORACLE,
    # union schema with per-batch NULLs — exactly what mergeSchema must
    # produce; NULL casts keep each branch's dtypes identical to the
    # batch that HAS the column (INT nationkey, DOUBLE acctbal)
    "q_ingest_schema_evolution": """
        SELECT s_suppkey, s_name, s_acctbal,
               CAST(NULL AS INTEGER) AS s_nationkey, 1 AS batch
        FROM supplier
        UNION ALL
        SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS s_acctbal,
               s_nationkey, 2 AS batch
        FROM supplier
    """,
    # PII scrub: blob regenerated from the index closed form; DuckDB's
    # regexp_replace needs the 'g' flag (Spark replaces all by default);
    # SSN hits counted on the email-redacted text and phone hits on the
    # email+SSN-redacted text, like the Spark side — each count sees the
    # text its replace sees. Patterns spliced verbatim — plain ANSI regex.
    "q_pii_scrub": (
        """
        WITH syn AS ("""
        + _SYN_FIELDS
        + """),
        blob AS (
            SELECT id,
                   'Contact ' || name || ' <' || id
                   || '@breweries.example>, tel ' || phone
                   || ', owner SSN 123-45-' || substr(phone, 5, 4) || '.'
                       AS contact_blob
            FROM syn)
        SELECT id, contact_blob,
               regexp_replace(regexp_replace(regexp_replace(contact_blob,
                   '"""
        + PII_EMAIL_RE
        + """', '[EMAIL]', 'g'),
                   '"""
        + PII_SSN_RE
        + """', '[SSN]', 'g'),
                   '"""
        + PII_PHONE_RE
        + """', '[PHONE]', 'g') AS scrubbed,
               CAST(len(regexp_extract_all(contact_blob, '"""
        + PII_EMAIL_RE
        + """')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(
                   regexp_replace(contact_blob, '"""
        + PII_EMAIL_RE
        + """', '[EMAIL]', 'g'), '"""
        + PII_SSN_RE
        + """')) AS BIGINT) AS n_ssns,
               CAST(len(regexp_extract_all(
                   regexp_replace(regexp_replace(contact_blob, '"""
        + PII_EMAIL_RE
        + """', '[EMAIL]', 'g'), '"""
        + PII_SSN_RE
        + """', '[SSN]', 'g'), '"""
        + PII_PHONE_RE
        + """')) AS BIGINT) AS n_phones
        FROM blob
    """
    ),
    "q_ingest_staged_json": _STAGED_JSON_ORACLE,
    # CSV stages the same payload with nullValue='' so both formats yield
    # identical bronze rows (the unit-tested contract) — same oracle.
    "q_ingest_staged_csv": _STAGED_JSON_ORACLE,
    "q_ingest_rest": f"""
        WITH syn AS ({_SYN_FIELDS})
        SELECT '{{"id": "' || id || '", "name": "' || name
               || '", "brewery_type": "' || brewery_type
               || '", "city": "' || city
               || '", "state_province": "' || state_province
               || '", "postal_code": "' || postal_code
               || '", "country": "United States", "longitude": "' || longitude
               || '", "latitude": "' || latitude
               || '", "phone": "' || phone
               || '", "website_url": null}}' AS raw_json,
               DATE '2024-01-15' AS extraction_date
        FROM syn
    """,
}
