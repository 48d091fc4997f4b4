"""Kubernetes golden-corpus parity test.

Replays the reference's runtime golden set (tests/runtime/data/kubernetes —
read in place from the read-only reference checkout, never copied): docker
.log lines -> docker parser -> KubernetesFilter (meta from the .meta pod
JSON, Merge_Log On, K8S-Logging.Parser On) -> out_lib-json serialization,
and asserts each .out file's content appears byte-for-byte in our output
stream (the same containment check the reference's cb_check_result does).

Covers in one shot: tag-key extraction, API-meta merge order, Merge_Log
json + annotation-parser + invalid-parser fallback, trailing-newline trim,
and flb_msgpack_to_json escaping.
"""

import glob
import json
import os

import pytest

from fluent_bit_ray.functions.mp_json import mp_json_event
from fluent_bit_ray.parsers import DEFAULT_REGISTRY
from fluent_bit_ray.stages.kubernetes import KubernetesFilter

DPATH = "/root/reference/tests/runtime/data/kubernetes"

# the tail-mode targets (kairosdb-* is systemd/journal mode — out of scope,
# no systemd input in the batch engine)
TARGETS = [
    "apache-logs",
    "apache-logs-annotated",
    "apache-logs-annotated-invalid",
    "json-logs",
    "json-logs-invalid",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DPATH), reason="reference corpus not available"
)


def load_metas() -> dict:
    metas = {}
    for f in glob.glob(os.path.join(DPATH, "*.meta")):
        pod = json.load(open(f))
        metas[pod["metadata"]["name"]] = pod
    return metas


def run_target(target: str) -> str:
    docker = DEFAULT_REGISTRY.get("docker")
    kube = KubernetesFilter(load_metas(), registry=DEFAULT_REGISTRY)
    out_events = []
    for logfile in sorted(glob.glob(os.path.join(DPATH, f"{target}_default*.log"))):
        # in_tail dyntag: Tag kube.* -> kube.<abs path, '/' -> '.'>
        tag = "kube." + logfile.replace("/", ".")
        for line in open(logfile):
            line = line.rstrip("\n")
            if not line:
                continue
            ts, rec = docker.parse_row(line)
            assert rec is not None, f"docker parse failed: {line[:80]}"
            out = kube.process_row(rec, tag)
            if out is None:
                continue
            out_events.append(mp_json_event((ts or 0) / 1e9, out))
    return "".join(out_events)


@pytest.mark.parametrize("target", TARGETS)
def test_golden_out_contained(target):
    stream = run_target(target)
    expected = open(os.path.join(DPATH, f"{target}.out")).read().rstrip("\r\n")
    assert expected in stream, (
        f"{target}: .out not found in output.\nexpected[:300]: "
        f"{expected[:300]}\ngot[:300]: {stream[:300]}"
    )


class TestKubeProperties:
    """kube_property semantics not exercised by the golden corpus."""

    TAG = (
        "kube.var.log.containers.kubernetes.mypod_default_app-"
        + "a" * 64 + ".log"
    )

    def _filter(self, ann):
        from fluent_bit_ray.stages.kubernetes import KubernetesFilter

        meta = {"mypod": {"metadata": {"name": "mypod", "uid": "u1",
                                       "annotations": ann},
                          "spec": {"nodeName": "n1"}}}
        return KubernetesFilter(meta, registry=None)

    def test_exclude_drops_record(self):
        f = self._filter({"fluentbit.io/exclude": "true"})
        assert f.process_row({"log": "x\n"}, self.TAG) is None

    def test_exclude_false_keeps(self):
        f = self._filter({"fluentbit.io/exclude": "false"})
        out = f.process_row({"log": "x\n"}, self.TAG)
        assert out is not None and out["log"] == "x"

    def test_parser_annotation_disabled_by_option(self):
        from fluent_bit_ray.parsers import DEFAULT_REGISTRY
        from fluent_bit_ray.stages.kubernetes import KubernetesFilter

        meta = {"mypod": {"metadata": {"name": "mypod",
                                       "annotations": {"fluentbit.io/parser": "apache"}},
                          "spec": {}}}
        line = '1.2.3.4 - - [21/Feb/2018:17:26:53 +0000] "GET /x HTTP/1.0" 200 5\n'
        on = KubernetesFilter(meta, registry=DEFAULT_REGISTRY)
        off = KubernetesFilter(meta, registry=DEFAULT_REGISTRY,
                               k8s_logging_parser=False)
        assert on.process_row({"log": line}, self.TAG).get("code") == "200"
        # with K8S-Logging.Parser Off the annotation is ignored; the log is
        # not JSON so no fields merge
        assert "code" not in off.process_row({"log": line}, self.TAG)

    def test_unmatched_tag_passthrough(self):
        f = self._filter(None)
        rec = {"log": "x\n"}
        assert f.process_row(rec, "other.tag") == rec
