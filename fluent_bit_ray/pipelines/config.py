"""Classic-mode config front end: [SERVICE]/[INPUT]/[FILTER]/[OUTPUT]/[PARSER]
sections → a runnable Ray Data pipeline.

Reference parity (studied, not copied): the config surface of
src/fluent-bit.c:368-540 (`flb_service_conf`) and each plugin's option names
— a user's existing fluent-bit classic config for the supported plugins
parses unchanged:

    [INPUT]  Name tail|parquet|dummy|mqtt|serial|…, Path, Tag, Parser,
             Path_Key (mqtt/serial read capture files of the live
             transport's byte stream; see sources/transports.py)
    [FILTER] Name grep|record_modifier|modify|nest|parser|throttle|stdout,
             Match, + the plugin's own options (Regex/Exclude, Remove_key/
             Whitelist_key/Record, Set/Add/Rename/…/Condition, Operation/
             Wildcard/Nest_under/Nested_under, Key_Name/Parser/Reserve_Data/
             Preserve_Key, Rate/Window/Interval)
    [OUTPUT] Name file|parquet|null|stdout|counter|flowcounter|es|influxdb|
             kafka|kafka_rest|nats|td|azure|splunk|http|forward|plot,
             Match, Path, Format json|csv|ltsv

Execution: each input becomes a Dataset; the filter chain is ONE fused
map_batches; outputs become SinkSpecs driven by SinkWriteStage. Timer/server
inputs (cpu/mem/tcp/…) are host-agent concerns out of scope for a data
engine (SURVEY §2.4) and raise a clear error naming the unsupported plugin.
"""

from __future__ import annotations

import glob as globmod
import os
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..parsers.core import DEFAULT_REGISTRY, ParserRegistry
from ..stages import (
    FilterChain,
    GrepFilter,
    ModifyFilter,
    NestFilter,
    ParserFilter,
    RecordModifierFilter,
    StdoutFilter,
    ThrottleFilter,
)
from ..sinks.writers import SinkSpec, SinkWriteStage


import re as _re

_KEYVAL_RE = _re.compile(r"^(\S+)(?:\s+(.*))?$")


def parse_classic(text: str) -> list[dict]:
    """Classic-mode INI-ish parser.

    Every key maps to a LIST of values; ``__lines__`` additionally records
    the (key, value) pairs in file order — rule-bearing filters (modify)
    apply their rules in CONFIG order across kinds, which the per-key lists
    can't express. Key/value separate on any whitespace run (fluent-bit
    accepts tabs)."""
    sections: list[dict] = []
    cur: Optional[dict] = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            cur = {"__name__": line[1:-1].lower(), "__lines__": []}
            sections.append(cur)
            continue
        if cur is None:
            continue
        m = _KEYVAL_RE.match(line)
        key = m.group(1).lower()
        value = (m.group(2) or "").strip()
        cur.setdefault(key, []).append(value)
        cur["__lines__"].append((key, value))
    return sections


def _one(sec: dict, key: str, default: Optional[str] = None) -> Optional[str]:
    v = sec.get(key)
    return v[0] if v else default


def _on(sec: dict, key: str, default: bool = False) -> bool:
    v = _one(sec, key)
    return default if v is None else v.lower() in ("on", "true", "1", "yes")


# ------------------------------------------------------------------ filters

def build_filter(sec: dict, registry: ParserRegistry):
    name = _one(sec, "name")
    if name == "grep":
        rules = []
        for kind in ("regex", "exclude"):
            for spec in sec.get(kind, []):
                f, _, p = spec.partition(" ")
                rules.append((kind, f, p.strip()))
        return GrepFilter(rules)
    if name == "record_modifier":
        records = []
        for spec in sec.get("record", []):
            k, _, v = spec.partition(" ")
            records.append((k, v.strip()))
        return RecordModifierFilter(
            remove_keys=sec.get("remove_key", []),
            whitelist_keys=sec.get("whitelist_key", []),
            records=records,
        )
    if name == "modify":
        # rules apply in CONFIG order across kinds (a Rename before a Set of
        # the same key behaves differently than the reverse) — walk the
        # ordered line record, not the per-key lists
        kinds = {"set", "add", "remove", "remove_wildcard", "rename",
                 "hard_rename", "copy", "hard_copy"}
        rules = []
        conds = []
        for key, spec in sec.get("__lines__", []):
            if key in kinds:
                parts = spec.split(None, 1)
                if key in ("remove", "remove_wildcard"):
                    rules.append((key, parts[0]))
                else:
                    a, b = parts[0], parts[1] if len(parts) > 1 else ""
                    rules.append((key, a, b))
            elif key == "condition":
                parts = spec.split(None, 2)
                conds.append(tuple([parts[0].lower()] + parts[1:]))
        return ModifyFilter(rules=rules, conditions=conds)
    if name == "nest":
        return NestFilter(
            operation=(_one(sec, "operation") or "").lower(),
            wildcard=sec.get("wildcard", []),
            nest_under=_one(sec, "nest_under"),
            nested_under=_one(sec, "nested_under"),
        )
    if name == "parser":
        parsers = [registry.get(p) for p in sec.get("parser", [])]
        return ParserFilter(
            key_name=_one(sec, "key_name", "log"),
            parsers=parsers,
            reserve_data=_on(sec, "reserve_data"),
            preserve_key=_on(sec, "preserve_key"),
        )
    if name == "throttle":
        return ThrottleFilter(
            rate=int(_one(sec, "rate", "5")),
            window=int(_one(sec, "window", "5")),
            interval_sec=int(_one(sec, "interval", "1").rstrip("s") or "1"),
        )
    if name == "stdout":
        return StdoutFilter()
    if name in ("lua", "udf"):
        # filter_lua (plugins/filter_lua/lua.c:292-411): a user-supplied
        # script transforms records one at a time.
        #   Script /path/to/script.lua   -> REAL Lua (stages/lua.py —
        #       the reference's cb(tag, ts, record) -> (code, ts, record)
        #       contract with -1/0/1 semantics), executed by lupa when
        #       importable, else the bundled minilua subset interpreter
        #       (functions/minilua.py).
        #   Script /path/to/script.py    -> Python UDF (engine-native
        #       path, documented divergence):
        #   Call   process            (function name; record dict -> dict,
        #                              None = drop, like lua's -1 drop)
        #       A `Call *_batch` naming convention selects the columnar
        #       batch path (pa.Table -> pa.Table).
        import importlib.util

        script = _one(sec, "script")
        if not script:
            raise ValueError("[FILTER] Name lua needs Script")
        if script.endswith(".lua"):
            from ..stages.lua import LuaFilter

            return LuaFilter(script_path=script,
                             call=_one(sec, "call", "cb_filter"))
        call = _one(sec, "call", "process")
        spec = importlib.util.spec_from_file_location("fbr_udf_script", script)
        if spec is None or spec.loader is None:
            raise ValueError(
                f"[FILTER] Name lua: Script {script!r} is not loadable as "
                "Python — this engine's UDF language is Python, not lua "
                "(documented divergence); point Script at a .py file"
            )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn = getattr(mod, call)
        from ..stages.throttle import UdfFilter

        if call.endswith("_batch"):
            return UdfFilter(batch_fn=fn)
        return UdfFilter(row_fn=fn)
    if name == "kubernetes":
        # the faithful filter_kubernetes analog (stages/kubernetes.py):
        #   Meta_Dir  /path/with/*.meta   (pod JSON files keyed by metadata.name
        #                                  — the API-server analog)
        #   Merge_Log On|Off, K8S-Logging.Parser On|Off, Annotations On|Off,
        #   Regex_Parser <named regex parser for tag->meta extraction>
        import glob as _glob
        import json as jsonmod

        from ..parsers.core import _ruby_to_python_regex
        from ..stages.kubernetes import TAG_TO_META_REGEX, KubernetesFilter

        metas = {}
        meta_dir = _one(sec, "meta_dir")
        if meta_dir:
            for f in sorted(_glob.glob(os.path.join(meta_dir, "*.meta"))):
                with open(f) as fh:
                    pod = jsonmod.load(fh)
                metas[pod["metadata"]["name"]] = pod
        tag_regex = TAG_TO_META_REGEX
        rp = _one(sec, "regex_parser")
        if rp:
            tag_regex = _ruby_to_python_regex(registry.get(rp).regex)
        return KubernetesFilter(
            metas,
            registry=registry,
            tag_regex=tag_regex,
            merge_log=_on(sec, "merge_log", True),
            k8s_logging_parser=_on(sec, "k8s-logging.parser", True),
            annotations=_on(sec, "annotations", True),
        )
    if name == "enrich":
        # filter_kubernetes-style lookup enrichment from a json dim file:
        #   Lookup /path/dim.json   ({key: {field: value}})
        #   Key_Name host           (join key column)
        #   Nest_under meta
        import json as jsonmod

        from ..stages.enrich import DictEnricher

        with open(_one(sec, "lookup")) as f:
            lookup = jsonmod.load(f)
        return DictEnricher(
            lookup,
            key_col=_one(sec, "key_name", "host"),
            under=_one(sec, "nest_under", "meta"),
        )
    raise ValueError(f"unsupported filter plugin: {name!r}")


# ------------------------------------------------------------------- inputs

def build_input(sec: dict, registry: ParserRegistry):
    """Input section -> (Dataset, static_tag | None). Lazy Ray import."""
    import ray.data

    name = _one(sec, "name")
    tag = _one(sec, "tag")
    if name == "parquet":
        path = _one(sec, "path")
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        ds = ray.data.read_parquet(files)
        return ds, tag or "parquet"
    if name == "tail":
        path = _one(sec, "path")
        parser = _one(sec, "parser")
        path_key = _one(sec, "path_key")
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        if _on(sec, "multiline"):
            return _tail_multiline(sec, files, registry), tag or "tail.0"
        ds = ray.data.read_text(files, include_paths=True)

        parsers = [registry.get(parser)] if parser else []

        def to_records(batch: pa.Table) -> pa.Table:
            out = pa.table({"log": batch["text"]})
            if path_key:
                out = out.append_column(path_key, batch["path"])
            out = out.append_column("_src_path", batch["path"])
            if parsers:
                pf = ParserFilter("log", parsers, reserve_data=True,
                                  preserve_key=False)
                parsed = pf.process_batch(out)
                # parse-failure fallback keeps {"log": line}
                # (plugins/in_tail/tail_file.c:240-245)
                return parsed
            return out

        ds = ds.map_batches(to_records, batch_format="pyarrow")
        return ds, tag or "tail.0"
    if name == "json":
        # in_forward/in_tcp batch analog: newline-delimited JSON objects
        path = _one(sec, "path")
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        ds = ray.data.read_text(files)

        def parse_json_lines(batch: pa.Table) -> pa.Table:
            from ..parsers.multidoc import concat_json_records

            rows = []
            for line in batch["text"].to_pylist():
                # incremental multi-doc tokenizer (flb_pack_json_state
                # analog): a line may carry several concatenated maps;
                # invalid/non-map content is dropped (flb_pack_json rejects)
                rows.extend(concat_json_records(line or ""))
            if not rows:
                return pa.table({"log": pa.array([], pa.string())})
            from ..functions.records import records_to_table

            # key-union assembly (from_pylist uses only the first record's
            # keys, dropping later-only fields)
            return records_to_table(rows)

        return ds.map_batches(parse_json_lines, batch_format="pyarrow"), tag or "json.0"
    if name == "stdin":
        import sys as sysmod

        lines = [l.rstrip("\n") for l in sysmod.stdin]
        ds = ray.data.from_items([{"log": l} for l in lines])
        return ds, tag or "stdin.0"
    if name == "random":
        # in_random analog: N samples of a deterministic u64 (seeded — the
        # reference reads /dev/urandom; a batch engine needs reproducibility)
        n = int(_one(sec, "samples", "1"))
        seed = int(_one(sec, "seed", "42"))

        def gen_random(batch: pa.Table) -> pa.Table:
            import numpy as _np

            idx = batch["id"].to_numpy(zero_copy_only=False).astype(_np.uint64)
            with _np.errstate(over="ignore"):
                x = (idx + _np.uint64(seed)) * _np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> _np.uint64(29)
            return pa.table({"rand_value": pa.array(x.astype(_np.int64))})

        ds = ray.data.range(n).map_batches(gen_random, batch_format="pyarrow")
        return ds, tag or "random.0"
    if name == "head":
        # in_head analog: first Lines lines (or Buf_Size bytes) of the file
        path = _one(sec, "file") or _one(sec, "path")
        lines_opt = _one(sec, "lines")
        buf_size = int(_one(sec, "buf_size", "256"))
        with open(path, "rb") as fh:
            payload = fh.read()
        if lines_opt:
            rows = [
                {"head": ln}
                for ln in payload.decode("utf-8", "replace").splitlines()[: int(lines_opt)]
            ]
        else:
            rows = [{"head": payload[:buf_size].decode("utf-8", "replace")}]
        ds = ray.data.from_items(rows)
        return ds, tag or "head.0"
    if name == "dummy":
        import json as jsonmod

        rec = jsonmod.loads(_one(sec, "dummy", '{"message":"dummy"}'))
        n = int(_one(sec, "samples", "1"))
        ds = ray.data.range(n).map_batches(
            lambda b: pa.table(
                {k: pa.array([v] * b.num_rows) for k, v in rec.items()}
            ),
            batch_format="pyarrow",
        )
        return ds, tag or "dummy.0"
    if name == "exec":
        # in_exec batch analog (plugins/in_exec/in_exec.c:37-110): run the
        # command ONCE (the reference re-runs per Interval — a batch engine
        # makes one deterministic invocation, documented divergence), one
        # record per stdout line; with Parser, failed lines are DROPPED,
        # without it each line packs as {"exec": line}.
        import subprocess as sp

        cmd = _one(sec, "command")
        if not cmd:
            raise ValueError("[INPUT] Name exec needs Command")
        parser_name = _one(sec, "parser")
        proc = sp.run(cmd, shell=True, capture_output=True, text=True,
                      timeout=int(_one(sec, "timeout", "60")))
        lines = proc.stdout.splitlines()
        if parser_name:
            parser = registry.get(parser_name)
            out = parser.parse_batch(lines)
            ok = pa.array(out.pop("_parse_ok"))
            ts = out.pop("_time")
            import numpy as _np

            cols = {
                k: (v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v))
                for k, v in out.items()
            }
            cols["_time"] = pa.array(ts, mask=(ts == _np.iinfo(_np.int64).min))
            table = pa.table(cols).filter(ok)
        else:
            table = pa.table({"exec": pa.array(lines, pa.string())})
        return ray.data.from_arrow(table), tag or "exec.0"
    if name == "syslog":
        # in_syslog batch analog (plugins/in_syslog/syslog_prot.c:42-96):
        # one record per line via the configured parser; lines the parser
        # rejects are DROPPED (the reference logs and skips them). Default
        # parser mirrors syslog_conf.c:123-132 (rfc5424 for stream mode).
        path = _one(sec, "path")
        if not path:
            raise ValueError("[INPUT] Name syslog needs Path (dump file/glob)")
        parser_name = _one(sec, "parser", "syslog-rfc5424")
        parser = registry.get(parser_name)
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        ds = ray.data.read_text(files)

        def parse_lines(batch: pa.Table, _p=parser) -> pa.Table:
            out = _p.parse_batch(batch["text"].to_pylist())
            ok = pa.array(out.pop("_parse_ok"))
            ts = out.pop("_time")
            import numpy as _np

            cols = {}
            for k, v in out.items():
                cols[k] = v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v)
            cols["_time"] = pa.array(ts, mask=(ts == _np.iinfo(_np.int64).min))
            return pa.table(cols).filter(ok)

        return ds.map_batches(parse_lines, batch_format="pyarrow"), tag or "syslog.0"
    if name in ("forward", "forward_file"):
        # in_forward's batch analog: msgpack forward-protocol dump files
        # ([tag, [[time, record], ...]] frames, EventTime fixext8 —
        # sources/msgpack_io.py). Tags come from the frames themselves, so
        # a static Tag option is ignored like fluentd's in_forward.
        from ..sources.msgpack_io import forward_file_dataset

        path = _one(sec, "path")
        if not path:
            raise ValueError("[INPUT] Name forward needs Path (dump file/glob)")
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        return forward_file_dataset(files), tag or "forward.0"
    if name in ("cpu", "mem", "disk", "netif", "proc", "health"):
        # host samplers (sources/host_metrics.py): ONE sample per run —
        # the batch analog of the reference's per-Interval collectors
        from ..sources import host_metrics as hm

        interval = float(_one(sec, "interval_sec", "0.5"))
        if name == "cpu":
            rec = hm.cpu_sample(interval)
        elif name == "mem":
            rec = hm.mem_sample()
        elif name == "disk":
            rec = hm.disk_sample(interval, _one(sec, "dev_name"))
        elif name == "netif":
            iface = _one(sec, "interface")
            if not iface:
                raise ValueError("[INPUT] Name netif needs Interface")
            rec = hm.netif_sample(iface, interval, _on(sec, "verbose"))
        elif name == "proc":
            pname = _one(sec, "proc_name")
            if not pname:
                raise ValueError("[INPUT] Name proc needs Proc_Name")
            rec = hm.proc_sample(pname, mem=_on(sec, "mem", True),
                                 fd=_on(sec, "fd", True))
        else:  # health
            rec = hm.health_sample(
                _one(sec, "host", "127.0.0.1"), int(_one(sec, "port", "80")),
            )
        from ..functions.records import records_to_table

        return ray.data.from_arrow(records_to_table([rec])), tag or f"{name}.0"
    if name == "systemd":
        # in_systemd batch analog: journald EXPORT-format dump files
        # (`journalctl -o export`) instead of the live journal socket.
        # Tag may carry `*` for the reference's dynamic unit expansion.
        from ..sources.host_metrics import journal_export_dataset

        path = _one(sec, "path")
        if not path:
            raise ValueError(
                "[INPUT] Name systemd needs Path (a journal export dump; "
                "the live journal socket is out of batch scope)"
            )
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        tag_pattern = tag or "systemd.0"
        return journal_export_dataset(files, tag_pattern), tag_pattern
    if name == "kmsg":
        from ..functions.records import records_to_table
        from ..sources.host_metrics import kmsg_drain

        try:
            recs = kmsg_drain(int(_one(sec, "max_records", "10000")))
        except OSError as e:
            raise ValueError(
                f"[INPUT] Name kmsg: /dev/kmsg unreadable here ({e}); the "
                "kernel ring requires privileges this environment lacks"
            ) from e
        return ray.data.from_arrow(records_to_table(recs)), tag or "kmsg.0"
    if name == "mqtt":
        # in_mqtt batch analog: an MQTT client-session capture file (the
        # bytes the live broker socket would deliver) instead of a server.
        # PUBLISH payloads must be JSON maps; topic is injected
        # (plugins/in_mqtt/mqtt_prot.c:112-172).
        from ..sources.transports import mqtt_capture_dataset

        path = _one(sec, "path")
        if not path:
            raise ValueError(
                "[INPUT] Name mqtt needs Path (an MQTT session capture "
                "file/glob; the live broker socket is out of batch scope)"
            )
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        return mqtt_capture_dataset(files), tag or "mqtt.0"
    if name == "serial":
        # in_serial batch analog: a tty byte-stream dump with the
        # reference's Separator / Format json framing
        # (plugins/in_serial/in_serial.c:100-230).
        from ..sources.transports import serial_capture_dataset

        path = _one(sec, "file") or _one(sec, "path")
        if not path:
            raise ValueError(
                "[INPUT] Name serial needs File (a captured byte-stream "
                "dump; the live tty is out of batch scope)"
            )
        files = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
        fmt = (_one(sec, "format") or "").lower() or None
        return (
            serial_capture_dataset(files, _one(sec, "separator"), fmt),
            tag or "serial.0",
        )
    raise ValueError(
        f"unsupported input plugin: {name!r} (the http server input is out "
        "of scope — a 113-LoC stub even in the reference, plugins/in_http; "
        "see SURVEY §2.4 and COVERAGE.md for the supported set)"
    )


def _tail_multiline(sec: dict, files: list[str], registry: ParserRegistry):
    """in_tail multiline mode (plugins/in_tail/tail_multiline.c semantics):
    a line matching ``Parser_Firstline`` starts a record; non-matching lines
    append to the previous record's payload. Whole-file tasks
    (read_binary_files) keep line order — a multiline record can never
    straddle a block boundary."""
    import ray.data

    firstline = registry.get(_one(sec, "parser_firstline"))
    path_key = _one(sec, "path_key")

    def split(batch: pa.Table) -> pa.Table:
        logs, paths = [], []
        for payload, p in zip(batch["bytes"].to_pylist(), batch["path"].to_pylist()):
            cur = None
            for line in payload.decode("utf-8", "replace").splitlines():
                _, parsed = firstline.parse_row(line)
                if parsed is not None:
                    if cur is not None:
                        logs.append(cur)
                        paths.append(p)
                    cur = line
                elif cur is not None:
                    cur += "\n" + line
                else:
                    cur = line  # leading continuation: its own raw record
            if cur is not None:
                logs.append(cur)
                paths.append(p)
        out = pa.table({"log": pa.array(logs, pa.string())})
        if path_key:
            out = out.append_column(path_key, pa.array(paths, pa.string()))
        pf = ParserFilter("log", [firstline], reserve_data=True, preserve_key=True)
        return pf.process_batch(out)

    ds = ray.data.read_binary_files(files, include_paths=True)
    return ds.map_batches(split, batch_format="pyarrow")


# ------------------------------------------------------------------ outputs

_SINK_FORMATS = {"json": "json", "csv": "csv", "ltsv": "ltsv",
                 "parquet": "parquet", "es": "es", "plot": "plot"}


@dataclass
class OutputSpec:
    kind: str  # file | parquet | null | stdout | counter | flowcounter
    match: str
    path: Optional[str]
    fmt: str
    fmt_options: tuple = ()


def build_output(sec: dict, idx: int) -> OutputSpec:
    name = _one(sec, "name")
    match = _one(sec, "match", "*")
    path = _one(sec, "path")
    fmt = (_one(sec, "format") or ("parquet" if name == "parquet" else "json")).lower()
    if name == "es":
        # out_es analog: daily-partitioned bulk-format json-lines sink
        spec = OutputSpec("file", match, path, "es")
        spec.fmt_options = (
            ("index", _one(sec, "logstash_prefix", _one(sec, "index", "fluentbit"))),
            ("type", _one(sec, "type", "flb_type")),
            # reference default: Logstash_Format Off (plugins/out_es)
            ("logstash", "on" if _on(sec, "logstash_format", False) else "off"),
            ("time_key", _one(sec, "time_key", "@timestamp")),
        )
        return spec
    if name == "plot":
        spec = OutputSpec("file", match, path, "plot")
        spec.fmt_options = (("key", _one(sec, "key", "value")),)
        return spec
    if name == "influxdb":
        # out_influxdb analog: line-protocol files (transport out of scope)
        spec = OutputSpec("file", match, path, "influxdb")
        opts = [("sequence_tag", _one(sec, "sequence_tag", "_seq"))]
        if _on(sec, "auto_tags", False):
            opts.append(("auto_tags", "on"))
        if _one(sec, "tag_keys"):
            opts.append(("tag_keys", _one(sec, "tag_keys")))
        spec.fmt_options = tuple(opts)
        return spec
    if name == "kafka":
        # out_kafka analog: json message bodies, one per line
        spec = OutputSpec("file", match, path, "kafka")
        spec.fmt_options = (
            ("timestamp_key", _one(sec, "timestamp_key", "@timestamp")),
        )
        return spec
    if name == "forward":
        # out_forward analog: msgpack forward-frame dump files that
        # round-trip through [INPUT] Name forward (transport out of scope)
        return OutputSpec("file", match, path, "forward")
    if name == "splunk":
        # out_splunk analog: HEC event-envelope payload files
        spec = OutputSpec("file", match, path, "splunk")
        if _on(sec, "splunk_send_raw", False):
            spec.fmt_options = (("splunk_send_raw", "on"),)
        return spec
    if name == "http":
        # out_http analog: json / json_stream / json_lines bodies
        spec = OutputSpec("file", match, path, "http")
        spec.fmt_options = (
            ("json_date_key", _one(sec, "json_date_key", "date")),
            ("json_date_format", _one(sec, "json_date_format", "double")),
            ("http_format", _one(sec, "format", "json")),
        )
        return spec
    if name == "nats":
        # out_nats analog: PUB-framed JSON payload files (transport out of
        # scope; plugins/out_nats/nats.c body + framing)
        return OutputSpec("file", match, path, "nats")
    if name == "kafka_rest":
        # out_kafka_rest analog: Kafka REST Proxy records-envelope bodies
        spec = OutputSpec("file", match, path, "kafka_rest")
        opts = [
            ("time_key", _one(sec, "time_key", "@timestamp")),
            ("time_key_format", _one(sec, "time_key_format",
                                     "%Y-%m-%dT%H:%M:%S")),
        ]
        if _on(sec, "include_tag_key", False):
            opts.append(("include_tag_key", "on"))
            opts.append(("tag_key", _one(sec, "tag_key", "_flb-key")))
        if _one(sec, "partition") is not None:
            opts.append(("partition", _one(sec, "partition")))
        if _one(sec, "message_key"):
            opts.append(("message_key", _one(sec, "message_key")))
        spec.fmt_options = tuple(opts)
        return spec
    if name == "td":
        # out_td analog: gzip msgpack import payloads (time key injected)
        return OutputSpec("file", match, path, "td")
    if name == "azure":
        # out_azure analog: Log Analytics JSON array bodies (the SharedKey
        # signature helper lives in sinks.writers.azure_shared_key_headers)
        spec = OutputSpec("file", match, path, "azure")
        spec.fmt_options = (
            ("time_key", _one(sec, "time_key", "@timestamp")),
        )
        return spec
    if name == "proxy":
        # external-plugin analog (src/flb_plugin_proxy.c ABI as a Python
        # module): Script names the plugin file; every other property is
        # passed to FLBPluginInit
        script = _one(sec, "script")
        if not script:
            raise ValueError(
                "[OUTPUT] Name proxy needs Script (a Python module exposing "
                "FLBPluginRegister/FLBPluginFlush — the flb_plugin_proxy "
                "symbol contract)"
            )
        spec = OutputSpec("proxy", match, None, "proxy")
        props = [(k, _one(sec, k)) for k in sec
                 if k not in ("__name__", "name", "match", "script")]
        spec.fmt_options = tuple([("script", script)] + props)
        return spec
    if name in ("file", "parquet", "null", "stdout", "counter", "flowcounter"):
        spec = OutputSpec(name, match, path, _SINK_FORMATS.get(fmt, "json"))
        opts = []
        if _one(sec, "delimiter"):
            opts.append(("delimiter", _one(sec, "delimiter")))
        if _one(sec, "label_delimiter"):
            opts.append(("label_delimiter", _one(sec, "label_delimiter")))
        spec.fmt_options = tuple(opts)
        return spec
    raise ValueError(f"unsupported output plugin: {name!r}")


# ------------------------------------------------------------------- engine

@dataclass
class PipelineResult:
    counts: dict = field(default_factory=dict)  # per-output routed record count
    aggregate: Optional[pa.Table] = None  # flowcounter table if configured
    stdout_sample: list = field(default_factory=list)
    # /api/v1/metrics-shaped snapshot (src/flb_metrics_exporter.c:collect_*
    # + flb_input.c:177-178 / flb_output.c:305-310 counter titles):
    # {"input": {"<plugin>.<i>": {"records", "bytes"}},
    #  "output": {"<name>_<i>": {"proc_records", "proc_bytes", "errors",
    #             "retries", "retries_failed"}}}. errors/retries are 0 by
    # construction in a completed batch run: sink errors RAISE (Ray task
    # retry owns them), so a returned result implies zero failed flushes;
    # in-task RetryPolicy attempts are not plumbed back.
    metrics: dict = field(default_factory=dict)


def run_config(
    text: str,
    out_root: Optional[str] = None,
    registry: Optional[ParserRegistry] = None,
) -> PipelineResult:
    """Parse a classic config and run the pipeline. Ray must be initialized
    by the caller (CLI does it; library users own their session)."""
    from .weblog import AGG_VALS, combine_partial_rows

    registry = registry or DEFAULT_REGISTRY
    sections = parse_classic(text)
    # [PARSER] sections extend the registry
    parser_text = "\n".join(
        _section_to_text(s) for s in sections if s["__name__"] == "parser"
    )
    if parser_text:
        registry.load_conf(parser_text)

    inputs = [s for s in sections if s["__name__"] == "input"]
    filters = [s for s in sections if s["__name__"] == "filter"]
    outputs = [build_output(s, i) for i, s in enumerate(
        s for s in sections if s["__name__"] == "output")]
    if not inputs:
        raise ValueError("config has no [INPUT] section")

    # the filter chain segments at throttle filters: throttle needs the
    # per-bucket GLOBAL view (a dataset-level groupby), so it can't live
    # inside a per-batch chain — chain segments run as fused map_batches,
    # throttles run between them
    parts: list = []
    current: list = []
    for s in filters:
        pat = _one(s, "match", "*")
        f = build_filter(s, registry)
        if isinstance(f, ThrottleFilter):
            if current:
                parts.append(("chain", FilterChain(current)))
                current = []
            parts.append(("throttle", pat, f))
        else:
            current.append((pat, f))
    if current:
        parts.append(("chain", FilterChain(current)))

    sinks = []
    out_names = []
    for i, o in enumerate(outputs):
        nm = f"{o.kind}_{i}"
        out_names.append(nm)
        if o.kind in ("file", "parquet", "proxy"):
            sinks.append(
                SinkSpec(nm, (o.match,),
                         "parquet" if o.kind == "parquet" else o.fmt,
                         fmt_options=tuple(o.fmt_options))
            )
        else:
            # null/stdout/counter/flowcounter: route + aggregate, no files
            sinks.append(SinkSpec(nm, (o.match,), "parquet", writes=False))
    write_dir = out_root

    from ..router import match_to_regex

    result = PipelineResult()
    agg_tables = []
    for in_idx, sec in enumerate(inputs):
        ds, tag = build_input(sec, registry)
        input_title = f"{_one(sec, 'name')}.{in_idx}"

        def add_tag(batch: pa.Table, _tag=tag) -> pa.Table:
            if "_tag" not in batch.column_names:
                batch = batch.append_column(
                    "_tag", pa.array([_tag] * batch.num_rows, pa.string())
                )
            return batch

        ds = ds.map_batches(add_tag, batch_format="pyarrow")
        chain_only = all(p[0] == "chain" for p in parts)
        fused_chains = []
        if chain_only:
            # fuse the whole record-level chain into the sink stage: the
            # input metrics partial must be counted BEFORE the filters
            # run (flb_input.h:570-590 sums, THEN calls flb_filter_do),
            # and fusing also drops N map_batches hops
            fused_chains = [p[1] for p in parts]
        else:
            for part in parts:
                if part[0] == "chain":
                    ds = ds.map_batches(
                        lambda b, _c=part[1]: _c.apply_batch(b),
                        batch_format="pyarrow",
                    )
                else:  # dataset-level throttle, honoring its Match pattern
                    _, pat, thr = part
                    if pat == "*":
                        ds = thr.apply_dataset(ds)
                    else:
                        rx = match_to_regex(pat)

                        def tag_mask(b: pa.Table, _r=rx):
                            return pc.fill_null(
                                pc.match_substring_regex(b["_tag"], _r), False
                            )

                        matched = ds.map_batches(
                            lambda b, _f=tag_mask: b.filter(_f(b)),
                            batch_format="pyarrow",
                        )
                        other = ds.map_batches(
                            lambda b, _f=tag_mask: b.filter(pc.invert(_f(b))),
                            batch_format="pyarrow",
                        )
                        ds = thr.apply_dataset(matched).union(other)
        # with a dataset-level throttle in the chain, the input partial is
        # counted post-chain (the single-pass tradeoff; throttle IS a
        # filter, so the reference would count before it — documented
        # deviation for throttle+metrics configs only)
        stage = SinkWriteStage(sinks, write_dir, bytes_col="log",
                               input_name=input_title,
                               pre_chain=fused_chains)
        partials = ds.map_batches(stage, batch_format="pyarrow")
        agg = combine_partial_rows(
            partials, ["sink", "lang", "host", "bucket"], AGG_VALS
        )
        agg_tables.append(agg)

    total = pa.concat_tables(agg_tables, promote_options="default")
    result.metrics = {"input": {}, "output": {}}
    for in_idx, sec in enumerate(inputs):
        title = f"{_one(sec, 'name')}.{in_idx}"
        sub = total.filter(pc.equal(total["sink"], f"_input::{title}"))
        result.metrics["input"][title] = {
            "records": pc.sum(sub["records"]).as_py() or 0,
            "bytes": pc.sum(sub["bytes"]).as_py() or 0,
        }
    for i, o in enumerate(outputs):
        nm = f"{o.kind}_{i}"
        sub = total.filter(pc.equal(total["sink"], nm))
        result.counts[nm] = pc.sum(sub["records"]).as_py() or 0
        result.metrics["output"][nm] = {
            "proc_records": result.counts[nm],
            "proc_bytes": pc.sum(sub["bytes"]).as_py() or 0,
            "errors": 0,
            "retries": 0,
            "retries_failed": 0,
        }
        if o.kind == "flowcounter":
            result.aggregate = sub
    return result


def _section_to_text(sec: dict) -> str:
    lines = [f"[{sec['__name__'].upper()}]"]
    for k, vs in sec.items():
        if k.startswith("__"):
            continue
        for v in vs:
            lines.append(f"    {k} {v}")
    return "\n".join(lines)
