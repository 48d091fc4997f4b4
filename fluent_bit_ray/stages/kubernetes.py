"""filter_kubernetes — metadata enrichment + Merge_Log + annotation props.

Reference parity (studied, not copied):
- tag -> (pod_name, namespace_name, container_name, docker_id) via the
  configured Regex_Parser (plugins/filter_kubernetes/kube_meta.c:483-520,
  conf/parsers.conf filter-kube-test / kube_regex.h KUBE_TAG_TO_REGEX);
- pod metadata (pod_id=uid, labels, annotations, host=spec.nodeName) comes
  from the API server; here it is a BROADCAST dict {pod_name: pod-json}
  (ray.put once, read per worker) — the batch analog of the reference's
  API-call-plus-hash-cache (kube_meta.c:752-784);
- the `kubernetes` map key order mirrors kube_meta.c:393-440: pod_name,
  namespace_name, pod_id, labels, annotations?, host, container_name,
  docker_id;
- Merge_Log (kubernetes.c:67-150, 185-330): trim trailing `\n`/`\r` (real
  or backslash-escaped) off `log`, apply the kube unescape, then parse —
  with the annotation parser when `fluentbit.io/parser` is present and
  K8S-Logging.Parser is On, else as JSON; parsed keys append AFTER the
  original map; the `log` value is re-packed trimmed/unescaped even when
  the parse fails (MERGE_UNESCAPED);
- `fluentbit.io/exclude: true` drops the record (kube_property.c:60-95);
- records whose tag doesn't match the regex pass through unchanged.

The per-record loop here is the protocol-fidelity path (the reference is
also per-record at this point); the production-scale enrich analog is the
vectorized broadcast join in stages/enrich.py.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

import pyarrow as pa

from ..parsers.core import Parser, ParserRegistry

# conf/parsers.conf `filter-kube-test` pattern (Python named-group syntax);
# the production default additionally anchors on var.log.containers
# (kube_regex.h KUBE_TAG_TO_REGEX)
TAG_TO_META_REGEX = (
    r".*kubernetes\.(?P<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?"
    r"(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)_(?P<namespace_name>[^_]+)_"
    r"(?P<container_name>.+)-(?P<docker_id>[a-z0-9]{64})\.log$"
)


def kube_unescape(s: str) -> str:
    """kubernetes.c:38-65 unescape: drop a backslash unless it precedes one
    of a/b/t/n/v/f/r (those two-char sequences are KEPT verbatim)."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        if s[i] == "\\":
            if i + 1 < n:
                if s[i + 1] not in "abtnvfr":
                    i += 1
            else:
                i += 1
                continue
        if i < n:
            out.append(s[i])
        i += 1
    return "".join(out)


def trim_log_tail(s: str) -> str:
    """Trailing-newline trim (kubernetes.c:100-118): strip real trailing
    '\\n' chars and backslash-escaped `\\n`/`\\r` two-char sequences."""
    size = len(s)
    i = size - 1
    while i > 0:
        if s[i] == "\n":
            size -= 1
            i -= 1
            continue
        if s[i - 1] == "\\" and s[i] in ("n", "r"):
            size -= 2
            i -= 2
        else:
            break
    return s[:size]


class KubernetesFilter:
    def __init__(
        self,
        meta_by_pod: Any,  # {pod_name: pod-json dict} or ray.ObjectRef
        registry: Optional[ParserRegistry] = None,
        tag_regex: str = TAG_TO_META_REGEX,
        merge_log: bool = True,
        k8s_logging_parser: bool = True,
        annotations: bool = True,
    ):
        self._meta_src = meta_by_pod
        self._meta: Optional[dict] = None
        self.registry = registry
        self.tag_re = re.compile(tag_regex)
        self.merge_log = merge_log
        self.k8s_logging_parser = k8s_logging_parser
        self.annotations = annotations

    # ------------------------------------------------------------- meta
    def _metas(self) -> dict:
        if self._meta is None:
            import ray

            src = self._meta_src
            self._meta = ray.get(src) if isinstance(src, ray.ObjectRef) else src
        return self._meta

    def _kube_map(self, m: re.Match) -> tuple[dict, Optional[str], bool]:
        """-> (kubernetes map, annotation parser name, exclude flag)."""
        g = m.groupdict()
        kube: dict = {
            "pod_name": g["pod_name"],
            "namespace_name": g["namespace_name"],
        }
        parser_name: Optional[str] = None
        exclude = False
        pod = self._metas().get(g["pod_name"])
        if pod:
            md = pod.get("metadata", {})
            if "uid" in md:
                kube["pod_id"] = md["uid"]
            if "labels" in md:
                kube["labels"] = md["labels"]
            ann = md.get("annotations")
            if ann:
                if self.annotations:
                    kube["annotations"] = ann
                for k, v in ann.items():
                    if not k.startswith("fluentbit.io/"):
                        continue
                    prop = k[len("fluentbit.io/"):]
                    if prop == "parser" and self.k8s_logging_parser:
                        parser_name = v
                    elif prop == "exclude":
                        exclude = str(v).lower() in ("true", "on", "1", "yes")
            node = pod.get("spec", {}).get("nodeName")
            if node is not None:
                kube["host"] = node
        kube["container_name"] = g["container_name"]
        kube["docker_id"] = g["docker_id"]
        return kube, parser_name, exclude

    # ------------------------------------------------------------ record
    def process_row(self, record: dict, tag: str) -> Optional[dict]:
        m = self.tag_re.search(tag or "")
        if m is None:
            return record  # meta extraction failed: record passes untouched
        kube, parser_name, exclude = self._kube_map(m)
        if exclude:
            return None
        out = dict(record)
        merged: Optional[dict] = None
        log = record.get("log")
        if self.merge_log and isinstance(log, str):
            clean = kube_unescape(trim_log_tail(log))
            out["log"] = clean  # re-packed even on parse failure
            parser: Optional[Parser] = None
            if parser_name and self.registry and parser_name in self.registry:
                parser = self.registry.get(parser_name)
            if parser is not None:
                _ts, rec = parser.parse_row(clean)
                if rec is not None:
                    merged = rec
            else:
                try:
                    obj = json.loads(clean)
                    if isinstance(obj, dict):
                        merged = obj
                except (ValueError, TypeError):
                    merged = None
        if merged:
            for k, v in merged.items():
                out[k] = v
        out["kubernetes"] = kube
        return out

    # ------------------------------------------------------------- batch
    def process_batch(self, table: pa.Table, mask: Optional[pa.Array] = None) -> pa.Table:
        """Batch application over `_tag` + record columns. Output schema is
        json-encoded per row (`record_to_json`-style) is NOT used here;
        instead rows round-trip through dicts — this filter is the
        protocol-fidelity analog (see module docstring)."""
        tags = table["_tag"].to_pylist() if "_tag" in table.column_names else [""] * table.num_rows
        m = mask.to_pylist() if mask is not None else None
        rows = []
        for i, rec in enumerate(table.to_pylist()):
            if m is not None and not m[i]:
                rows.append(rec)
                continue
            tag = rec.get("_tag", tags[i])
            from .base import ENGINE_COLS

            out = self.process_row(
                {k: v for k, v in rec.items() if k not in ENGINE_COLS}, tag
            )
            if out is None:
                continue
            for k, v in rec.items():
                if k in ENGINE_COLS:
                    out[k] = v
            rows.append(out)
        if not rows:
            return table.slice(0, 0)
        from ..functions.records import records_to_table

        # key-union assembly: from_pylist would derive the schema from the
        # FIRST row and silently drop the kubernetes map / merged keys
        # whenever row 0 didn't match the tag regex
        return records_to_table(rows)
