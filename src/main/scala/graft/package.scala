/**
 * graft — a Spark-native ETL + analytics engine with the capability
 * surface of the reference config-driven ETL job engine
 * (`amreekbasra/etl-load`, see SURVEY.md), re-expressed as declarative
 * DataFrame plans rather than row-at-a-time loops.
 *
 * Map of the library (details + SURVEY §2 coverage map in README.md):
 *
 *  - [[graft.model]]     — JobConfig case classes + lenient JSON codec
 *  - [[graft.types]]     — CastEngine: the reference's cast matrix as
 *                          Column transforms (try_cast under ANSI)
 *  - [[graft.sources]]   — parquet/CSV/JSON/fixed-width (DataSource V2
 *                          with source-level pruning)/JDBC/REST scans
 *  - [[graft.sinks]]     — parquet/CSV/JSON/JDBC/REST writers
 *  - [[graft.operators]] — MappingOp (project/rename/cast/rules),
 *                          ErrorPolicy (FAIL_JOB|LOG_ONLY|ROUTE_TO_FILE),
 *                          Dedup (exact/MinHash+LSH/SimHash),
 *                          Similarity (brute-force/LSH/IVF ANN),
 *                          Skew (salted aggregate/join)
 *  - [[graft.functions]] — native codegen Expressions: rolling-hash
 *                          fingerprint, dot product
 *  - [[graft.multimodal]]— binary payload columns: batched feature
 *                          extraction (stub decode), frame sampling
 *  - [[graft.streaming]] — watermarked windows (tumbling/sliding/
 *                          session), stateful ops, stream-stream joins
 *  - [[graft.job]]       — step interpreter, queue trigger, metrics
 *                          listener, retry, submit-from-file CLI
 *
 * The driver contract lives in [[graft.SparkEntry]]: every operator is
 * exposed as a named query with (where exactly expressible) a DuckDB
 * oracle that the correctness gate hash-compares cell by cell.
 */
package object graft
