"""Host-sampler inputs — batch analogs of in_cpu/mem/disk/netif/proc/health.

Reference parity (studied, not copied): the reference samples these every
`Interval_Sec` from a daemon event loop; a batch engine takes ONE sample
per run (delta-based metrics take two snapshots `interval_sec` apart
inside the call). Field names and math mirror the C collectors:

- in_cpu (plugins/in_cpu/in_cpu.c:320-360, in_cpu.h:97-127): cpu_p /
  user_p / system_p overall (delta/ticks/n_cpus/interval) + per-core
  cpuN.p_cpu / cpuN.p_user / cpuN.p_system;
- in_mem (plugins/in_mem/mem.c:90-230): Mem.total/used/free,
  Swap.total/used/free in KB;
- in_disk (plugins/in_disk/in_disk.c:29-190): read_size / write_size —
  byte deltas summed over devices (512-byte sectors);
- in_netif (plugins/in_netif/in_netif.c:30-250): <iface>.rx.bytes etc —
  the non-verbose entry set unless verbose;
- in_proc (plugins/in_proc/in_proc.c:100-310): alive, proc_name, pid,
  mem.VmPeak..mem.VmSwap (KB), fd count;
- in_health (plugins/in_health): alive = TCP connect success.

Values are inherently host-dependent (not deterministic); tests assert
schema and sanity, not values.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional


def _read_proc_stat() -> dict[str, tuple[int, int]]:
    """{'cpu'|'cpuN': (user+nice ticks, system ticks)} — the two counters
    the reference's percent math consumes (in_cpu.c snapshots)."""
    out = {}
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu"):
                break
            parts = line.split()
            user, nice, system = (int(x) for x in parts[1:4])
            out[parts[0]] = (user + nice, system)
    return out


def _check_interval(interval_sec: float) -> float:
    if not interval_sec > 0:
        raise ValueError(
            f"Interval_Sec must be positive, got {interval_sec!r}"
        )
    return interval_sec


def cpu_sample(interval_sec: float = 0.5) -> dict:
    _check_interval(interval_sec)
    ticks = os.sysconf("SC_CLK_TCK")
    a = _read_proc_stat()
    time.sleep(interval_sec)
    b = _read_proc_stat()
    n_cpus = max(1, len(a) - 1)

    def pct(pre: int, now: int, per_core: bool) -> float:
        if pre == now:
            return 0.0
        diff = abs(now - pre)
        if per_core:
            return ((diff * 100) / ticks) / interval_sec
        return (((diff / ticks) * 100) / n_cpus) / interval_sec

    rec: dict = {
        "cpu_p": pct(a["cpu"][0] + a["cpu"][1], b["cpu"][0] + b["cpu"][1], False),
        "user_p": pct(a["cpu"][0], b["cpu"][0], False),
        "system_p": pct(a["cpu"][1], b["cpu"][1], False),
    }
    for i in range(n_cpus):
        k = f"cpu{i}"
        if k not in a or k not in b:
            continue
        rec[f"{k}.p_cpu"] = pct(a[k][0] + a[k][1], b[k][0] + b[k][1], True)
        rec[f"{k}.p_user"] = pct(a[k][0], b[k][0], True)
        rec[f"{k}.p_system"] = pct(a[k][1], b[k][1], True)
    return rec


def mem_sample() -> dict:
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, _, v = line.partition(":")
            info[k.strip()] = int(v.split()[0])  # already KB
    mem_total = info.get("MemTotal", 0)
    mem_free = info.get("MemFree", 0)
    swap_total = info.get("SwapTotal", 0)
    swap_free = info.get("SwapFree", 0)
    return {
        "Mem.total": mem_total,
        "Mem.used": mem_total - mem_free,
        "Mem.free": mem_free,
        "Swap.total": swap_total,
        "Swap.used": swap_total - swap_free,
        "Swap.free": swap_free,
    }


def _diskstats(dev_name: Optional[str]) -> tuple[int, int]:
    read_sectors = write_sectors = 0
    with open("/proc/diskstats") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 10:
                continue
            name = parts[2]
            if dev_name is not None and dev_name not in name:
                continue
            read_sectors += int(parts[5])
            write_sectors += int(parts[9])
    return read_sectors * 512, write_sectors * 512


def disk_sample(interval_sec: float = 0.5, dev_name: Optional[str] = None) -> dict:
    _check_interval(interval_sec)
    r0, w0 = _diskstats(dev_name)
    time.sleep(interval_sec)
    r1, w1 = _diskstats(dev_name)
    return {"read_size": r1 - r0, "write_size": w1 - w0}


_NETIF_ENTRIES = [
    ("rx.bytes", True), ("rx.packets", True), ("rx.errors", True),
    ("rx.drop", False), ("rx.fifo", False), ("rx.frame", False),
    ("rx.compressed", False), ("rx.multicast", False),
    ("tx.bytes", True), ("tx.packets", True), ("tx.errors", True),
    ("tx.drop", False), ("tx.fifo", False), ("tx.collisions", False),
    ("tx.carrier", False), ("tx.compressepd", False),  # sic, reference typo
]


def _netdev(interface: str) -> Optional[list[int]]:
    with open("/proc/net/dev") as f:
        for line in f:
            if ":" not in line:
                continue
            name, _, rest = line.partition(":")
            if name.strip() == interface:
                return [int(x) for x in rest.split()[:16]]
    return None


def netif_sample(
    interface: str, interval_sec: float = 0.5, verbose: bool = False
) -> dict:
    _check_interval(interval_sec)
    a = _netdev(interface)
    time.sleep(interval_sec)
    b = _netdev(interface)
    if a is None or b is None:
        raise ValueError(f"in_netif: interface {interface!r} not found")
    rec = {}
    for i, (key, default_on) in enumerate(_NETIF_ENTRIES):
        if verbose or default_on:
            rec[f"{interface}.{key}"] = b[i] - a[i]
    return rec


def proc_sample(proc_name: str, mem: bool = True, fd: bool = True) -> dict:
    pid = None
    for comm in glob.glob("/proc/[0-9]*/comm"):
        try:
            with open(comm) as f:
                if f.read().strip() == proc_name:
                    pid = int(comm.split("/")[2])
                    break
        except OSError:
            continue
    rec: dict = {"alive": pid is not None, "proc_name": proc_name,
                 "pid": pid if pid is not None else -1}
    if pid is None:
        return rec
    if mem:
        try:
            with open(f"/proc/{pid}/status") as f:
                status = {
                    k.strip(): v for k, _, v in
                    (line.partition(":") for line in f)
                }
            for key in ("VmPeak", "VmSize", "VmLck", "VmHWM", "VmRSS",
                        "VmData", "VmStk", "VmExe", "VmLib", "VmPTE",
                        "VmSwap"):
                if key in status:
                    rec[f"mem.{key}"] = int(status[key].split()[0])
        except OSError:
            pass
    if fd:
        try:
            rec["fd"] = len(os.listdir(f"/proc/{pid}/fd"))
        except OSError:
            pass
    return rec


def kmsg_drain(max_records: int = 10000) -> list[dict]:
    """in_kmsg analog (plugins/in_kmsg/in_kmsg.c:100-210): drain the
    buffered kernel ring once (non-blocking /dev/kmsg) into records of
    priority (pri & 7), sequence, sec/usec (monotonic), msg.

    The reference tails /proc/kmsg forever; one buffered drain is the
    batch analog. Raises OSError where the device is unreadable
    (unprivileged containers) — callers surface a clear input error."""
    out: list[dict] = []
    fd = os.open("/dev/kmsg", os.O_RDONLY | os.O_NONBLOCK)
    try:
        while len(out) < max_records:
            try:
                raw = os.read(fd, 65536)
            except BlockingIOError:
                break
            except OSError as e:
                import errno as _errno

                if e.errno == _errno.EPIPE:
                    continue  # ring overwritten under us; next record
                break  # any persistent errno would loop forever
            if not raw:
                break
            line = raw.decode("utf-8", "replace")
            head, _, msg = line.partition(";")
            fields = head.split(",")
            if len(fields) < 3:
                continue
            try:
                prival = int(fields[0])
                seq = int(fields[1])
                usec_total = int(fields[2])
            except ValueError:
                continue
            out.append(
                {
                    "priority": prival & 7,  # FLB_KLOG_PRI
                    "sequence": seq,
                    "sec": usec_total // 1_000_000,
                    "usec": usec_total % 1_000_000,
                    "msg": msg.rstrip("\n"),
                }
            )
    finally:
        os.close(fd)
    return out


def iter_journal_export(data: bytes):
    """Parse the systemd Journal Export Format (public spec,
    systemd.io/JOURNAL_EXPORT_FORMATS): entries separated by an empty
    line; `FIELD=value` text lines; binary fields as `FIELD\\n` + 64-bit
    LE length + payload + `\\n`. Yields one {field: str} dict per entry.
    """
    pos = 0
    n = len(data)
    fields: dict = {}
    while pos < n:
        nl = data.find(b"\n", pos)
        if nl == -1:
            nl = n
        line = data[pos:nl]
        if not line:
            if fields:
                yield fields
                fields = {}
            pos = nl + 1
            continue
        eq = line.find(b"=")
        if eq >= 0:
            fields[line[:eq].decode("utf-8", "replace")] = line[eq + 1 :].decode(
                "utf-8", "replace"
            )
            pos = nl + 1
        else:
            # binary field: name, newline, LE u64 size, payload, newline
            name = line.decode("utf-8", "replace")
            size = int.from_bytes(data[nl + 1 : nl + 9], "little")
            payload = data[nl + 9 : nl + 9 + size]
            fields[name] = payload.decode("utf-8", "replace")
            pos = nl + 9 + size + 1
    if fields:
        yield fields


def journal_export_records(
    data: bytes, tag_pattern: str = "systemd.0"
) -> list[tuple[str, Optional[int], dict]]:
    """Export entries -> (tag, time_ns | None, record) per the reference's
    in_systemd composition (plugins/in_systemd/systemd.c:100-190):
    time from __REALTIME_TIMESTAMP (usec); a `*` in the Tag expands to the
    _SYSTEMD_UNIT (or 'unknown', tag_compose:28-57); the record keeps the
    journal fields minus the synthetic double-underscore address fields.
    """
    out = []
    for fields in iter_journal_export(data):
        ts = None
        rt = fields.get("__REALTIME_TIMESTAMP")
        if rt is not None:
            try:
                ts = int(rt) * 1000
            except ValueError:
                ts = None
        if "*" in tag_pattern:
            unit = fields.get("_SYSTEMD_UNIT", "unknown")
            tag = tag_pattern.replace("*", unit, 1)
        else:
            tag = tag_pattern
        rec = {k: v for k, v in fields.items() if not k.startswith("__")}
        out.append((tag, ts, rec))
    return out


def journal_export_dataset(files: list, tag_pattern: str = "systemd.0"):
    """Journal export dumps -> Ray Dataset: one read task per file, decode
    inside map_batches (no driver-side materialization of the dumps)."""
    import pyarrow as pa
    import ray.data

    from ..functions.records import records_to_table

    ds = ray.data.read_binary_files(files)

    def decode(batch: pa.Table) -> pa.Table:
        rows = []
        for bts in batch["bytes"]:
            for rtag, ts, rec in journal_export_records(bts.as_py(), tag_pattern):
                row = dict(rec)
                row["_tag"] = rtag
                row["_time"] = ts
                rows.append(row)
        if not rows:
            return pa.table({"_tag": pa.array([], pa.string()),
                             "_time": pa.array([], pa.int64())})
        return records_to_table(rows)

    return ds.map_batches(decode, batch_format="pyarrow")


def health_sample(host: str, port: int, timeout_sec: float = 2.0) -> dict:
    import socket

    try:
        with socket.create_connection((host, port), timeout=timeout_sec):
            return {"alive": True}
    except OSError:
        return {"alive": False}
