#!/usr/bin/env python3
"""Convert the reference's CLI test corpus (/root/reference/test/cli/*.yaml,
the run_cli_test.py format) into JSON fixtures the Scala test suite can read
with the engine's own JSON parser (graft.proj.ops.TinshiftOps.Json).

This is a dev-time generator in the same spirit as epsg_init_gen.py: the
output under src/test/resources/graft/cli/ is checked in; the Scala side
never needs a YAML parser.

Each fixture is {"exe": str, "env": {..}, "tests": [test...]} where a test
keeps exactly the keys run_cli_test.py understands (args normalised to a
list via shlex like the reference runner does, in/out/stdout/stderr as
strings, exitcode int, sub as [pat, repl], grep str, file as
[{name, content}...]).
"""
import json, os, shlex, sys

try:
    import yaml  # pyyaml
except ImportError:
    sys.exit("pyyaml required (driver-side python)")

SRC = "/root/reference/test/cli"
OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/graft/cli")

FILES = [
    "test_proj.yaml",
    "test_invproj.yaml",
    "test_proj_nad27.yaml",
    "test_proj_nad83.yaml",
    "test_cs2cs_various.yaml",
    "test_cs2cs_datumfile.yaml",
    "test_cs2cs_ntv2.yaml",
    "test_cs2cs_flaky.yaml",
    "test_cs2cs_ignf.yaml",
    "test_cct.yaml",
    "test_gie.yaml",
    "test_projinfo.yaml",
]


def norm_args(args):
    if args is None:
        return []
    if isinstance(args, list):
        return [str(a) for a in args]
    # the reference runner uses shlex.split on string args
    return shlex.split(str(args))


def conv_test(t, idx):
    out = {"index": idx}
    for k in ("comment", "in", "input", "stdout", "stderr", "out", "skipif"):
        if k in t and t[k] is not None:
            out[k] = str(t[k])
    # grep/grep-v accept a single pattern or a list applied sequentially
    # (reference run_cli_test.py:390,554); normalize to a list
    for k in ("grep", "grep-v"):
        if k in t and t[k] is not None:
            v = t[k]
            out[k] = [str(x) for x in (v if isinstance(v, list) else [v])]
    if "sort" in t:
        out["sort"] = True
    for k in ("head", "tail"):
        if k in t and t[k] is not None:
            out[k] = int(t[k])
    if "args" in t:
        out["args"] = norm_args(t["args"])
    else:
        out["args"] = []
    if "exitcode" in t:
        out["exitcode"] = int(t["exitcode"])
    if "sub" in t:
        sub = t["sub"]
        assert isinstance(sub, list) and len(sub) == 2, sub
        out["sub"] = [str(sub[0]), str(sub[1])]
    if "file" in t:
        files = t["file"]
        if isinstance(files, dict):
            files = [files]
        out["file"] = [{"name": str(f["name"]), "content": str(f["content"])}
                       for f in files]
    if "env" in t:
        out["env"] = {str(k): str(v) for k, v in t["env"].items()}
    if "tmpdir" in t:
        out["tmpdir"] = True
        if "copy" in t:
            c = t["copy"]
            out["copy"] = [str(x) for x in (c if isinstance(c, list) else [c])]
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in FILES:
        with open(os.path.join(SRC, name)) as f:
            doc = yaml.safe_load(f)
        fixture = {
            "exe": str(doc.get("exe", "")),
            "env": {str(k): str(v) for k, v in (doc.get("env") or {}).items()},
            "tests": [conv_test(t, i) for i, t in enumerate(doc["tests"])],
        }
        out_path = os.path.join(OUT, name.replace(".yaml", ".json"))
        with open(out_path, "w") as f:
            json.dump(fixture, f, indent=1, ensure_ascii=False)
        print(f"{name}: {len(fixture['tests'])} tests -> {out_path}")


if __name__ == "__main__":
    main()
