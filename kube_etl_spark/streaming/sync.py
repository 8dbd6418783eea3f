"""The KRMSyncer engine, Spark-first (SURVEY.md §3.3 / M3b): a rule
table compiled into a dataflow —

  op-log stream → broadcast-join(rules: equality+glob+in-list, suspend
  gate) → fan-out (1 event × N matching rules) → syncFields projection +
  metadata normalization → per-destination idempotent MERGE/DELETE.

Reference semantics, each mapped with citations into /root/reference/:
  * Rule schema + defaults: syncer/api/v1alpha1/krmsyncer_types.go:24-84
    (namespaces empty ⇒ all :33; sync_fields default ["status"] :37-39;
    mode "" ⇒ pull :77).
  * Glob validation: only `*.cnrm.cloud.google.com`-family group globs,
    and then version+kind must both be `*`
    (syncer/controllers/krmsyncer_controller.go:105-116).
  * Match predicate: exact GVK equality OR the KCC suffix glob
    (krmsyncer_controller.go:156-192, 395-407, 456-459).
  * Namespace in-list, applied per event (krmsyncer_controller.go:462-474).
  * Suspend gate (krmsyncer_controller.go:83-93, 432-434).
  * Fan-out: an event is processed once per matching syncer
    (krmsyncer_controller.go:431-530) — duplicates by design.
  * Projection: sync_fields ⊆ {spec, status, spec.resourceID}; GVK,
    name, namespace, labels, annotations always retained
    (krmsyncer_controller.go:561-584); resourceVersion/uid stripped
    (:518-521).
  * Sink: last-writer-wins idempotent upsert / delete propagation
    (krmsyncer_controller.go:586-624, 489-504) → cdc.StateTable.

Scale notes: the rule table is tiny → broadcast; the only shuffle in
the whole pipeline is the per-destination MERGE compaction keyed on the
object key. Glob expansion happens at plan time in the reference
(discovery expansion); here the glob predicate is evaluated inside the
broadcast join — same result, and Catalyst folds the rule constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Leading dot required: '*.evilcnrm.cloud.google.com' must NOT validate
# (krmsyncer_controller.go:105-116 matches the '.cnrm.…' dotted family).
KCC_SUFFIX = ".cnrm.cloud.google.com"
ALWAYS_KEPT = ("group", "version", "kind", "namespace", "name", "labels", "annotations")
VALID_SYNC_FIELDS = ("spec", "status", "spec.resourceID")


def normalize_rules(rules: DataFrame) -> DataFrame:
    """Apply the CRD defaults (types.go:33-39, 77): empty mode ⇒ pull,
    empty sync_fields ⇒ ["status"], null namespaces ⇒ [] (= all)."""
    return rules.select(
        "syncer_name",
        F.coalesce("suspend", F.lit(False)).alias("suspend"),
        F.when(F.col("mode").isNull() | (F.col("mode") == ""), "pull")
        .otherwise(F.col("mode"))
        .alias("mode"),
        "rule_group",
        "rule_version",
        "rule_kind",
        F.coalesce("namespaces", F.array().cast("array<string>")).alias("namespaces"),
        F.when(
            F.col("sync_fields").isNull() | (F.size("sync_fields") == 0),
            F.array(F.lit("status")),
        )
        .otherwise(F.col("sync_fields"))
        .alias("sync_fields"),
    )


def validate_rules(rules: DataFrame) -> DataFrame:
    """P8: accept/reject each rule with a reason column.

    Legal shapes (krmsyncer_controller.go:105-116):
      * no wildcard anywhere, or
      * rule_group = `*.<something>cnrm.cloud.google.com` AND
        rule_version = '*' AND rule_kind = '*'.
    """
    is_group_glob = F.col("rule_group").startswith("*.")
    kcc_glob = is_group_glob & F.col("rule_group").endswith(KCC_SUFFIX)
    any_wild = (
        is_group_glob | (F.col("rule_version") == "*") | (F.col("rule_kind") == "*")
    )
    fully_wild = kcc_glob & (F.col("rule_version") == "*") & (F.col("rule_kind") == "*")
    bad_fields = F.exists(
        "sync_fields", lambda x: ~x.isin(*[F.lit(v) for v in VALID_SYNC_FIELDS])
    )
    reason = (
        F.when(bad_fields, "invalid sync_fields entry")
        .when(any_wild & ~fully_wild, "glob only legal as *.cnrm group with */* version+kind")
        .otherwise(F.lit(None).cast("string"))
    )
    return rules.withColumn("reject_reason", reason).withColumn(
        "valid", F.col("reject_reason").isNull()
    )


def rule_match_condition(obj: DataFrame, rules: DataFrame) -> F.Column:
    """The per-event match predicate (krmsyncer_controller.go:456-474)."""
    exact = (
        (obj["group"] == rules["rule_group"])
        & (obj["version"] == rules["rule_version"])
        & (obj["kind"] == rules["rule_kind"])
    )
    glob = (
        rules["rule_group"].startswith("*.")
        & (rules["rule_version"] == "*")
        & (rules["rule_kind"] == "*")
        & obj["group"].endswith(F.expr("substr(rule_group, 2)"))
    )
    ns_ok = (F.size(rules["namespaces"]) == 0) | F.array_contains(
        rules["namespaces"], obj["namespace"]
    )
    return (exact | glob) & ns_ok


def project_sync_fields(matched: DataFrame) -> DataFrame:
    """P1+P2: keep GVK/name/namespace/labels/annotations always; copy
    spec/status/spec.resourceID per the rule's sync_fields; strip
    resource_version/uid (normalization). spec.resourceID projection
    rebuilds a spec struct containing only resourceID
    (krmsyncer_controller.go:571-582)."""
    has = lambda f: F.array_contains("sync_fields", f)  # noqa: E731
    spec = (
        F.when(has("spec"), F.col("spec"))
        .when(
            has("spec.resourceID"),
            F.when(
                F.col("spec.resourceID").isNotNull(),
                F.struct(
                    F.lit(None).cast("string").alias("foo"),
                    F.col("spec.resourceID").alias("resourceID"),
                ),
            ),
        )
        .otherwise(F.lit(None).cast("struct<foo:string,resourceID:string>"))
    )
    status = F.when(has("status"), F.col("status")).otherwise(
        F.lit(None).cast("struct<bar:string>")
    )
    return matched.select(
        "syncer_name",
        "mode",
        *ALWAYS_KEPT,
        spec.alias("spec"),
        status.alias("status"),
        "op",
        "seq",
    )


def compile_sync(oplog: DataFrame, rules: DataFrame) -> DataFrame:
    """Compile the rule table against an op-log (stream or batch) into
    the synced-change DataFrame: one output row per (event × matching
    active rule), projected and normalized. Works identically on a
    readStream op-log (the broadcast join and projection are
    stream-compatible); deletes pass through with null payload."""
    active = normalize_rules(rules)
    active = validate_rules(active).filter("valid").filter(~F.col("suspend"))
    active = active.select(
        "syncer_name", "mode", "rule_group", "rule_version", "rule_kind",
        "namespaces", "sync_fields",
    )
    matched = oplog.join(F.broadcast(active), rule_match_condition(oplog, active))
    return project_sync_fields(matched)


def sync_to_state(
    changes: DataFrame,
    make_state,
) -> dict[str, "object"]:
    """Batch driver: route compiled changes into one StateTable per
    (syncer_name) destination via idempotent MERGE — the two-cluster
    write fan-out. `make_state(syncer_name) -> StateTable`. Returns the
    state tables written. (The streaming driver wraps compile_sync +
    this routing inside foreachBatch — see tests/test_sync.py.)"""
    states: dict[str, object] = {}
    for row in changes.select("syncer_name").distinct().collect():
        name = row["syncer_name"]
        st = make_state(name)
        st.merge_batch(changes.filter(F.col("syncer_name") == name).drop("syncer_name", "mode"))
        states[name] = st
    return states
