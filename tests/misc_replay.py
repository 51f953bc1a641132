"""Miner for op-faithful replay of the reference's misc.js cases.

Extracts (op, input, ctx/frame, options, eventCodeLog, testSafe,
testNotSafe) tuples from each ``_test({...})`` call: JSON input blobs
are taken verbatim, tiny JS option/event literals are JSON-ified with
a conservative rewriter, and anything that doesn't parse cleanly is
skipped (counted, never silently mis-parsed). The expected outputs
are NOT mined — the reference itself is the oracle at runtime.
"""

from __future__ import annotations

import json
import re

_DECODER = json.JSONDecoder()


def _balanced(src: str, start: int, open_ch: str, close_ch: str) -> str | None:
    """Return the balanced {...}/[...] slice starting at src[start]
    (which must be open_ch), honoring single/double-quoted strings."""
    assert src[start] == open_ch
    depth = 0
    i = start
    in_str: str | None = None
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == in_str:
                in_str = None
        elif c in "'\"":
            in_str = c
        elif c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return src[start:i + 1]
        i += 1
    return None


def _strip_comments(js: str) -> str:
    out = []
    for line in js.split("\n"):
        # drop // comments (none of the misc literals carry URLs in
        # option position; string-embedded slashes survive because we
        # only strip when // appears outside quotes)
        q = False
        qc = ""
        cut = len(line)
        i = 0
        while i < len(line) - 1:
            c = line[i]
            if q:
                if c == "\\":
                    i += 2
                    continue
                if c == qc:
                    q = False
            elif c in "'\"":
                q, qc = True, c
            elif c == "/" and line[i + 1] == "/":
                cut = i
                break
            i += 1
        out.append(line[:cut])
    return "\n".join(out)


def _js_literal_to_json(js: str):
    """Parse a SMALL JS object/array literal (options, eventCodeLog):
    strip comments, quote bare keys, single->double quotes, drop
    trailing commas. Returns the parsed value or None."""
    s = _strip_comments(js)
    s = re.sub(r"'((?:[^'\\]|\\.)*)'",
               lambda m: json.dumps(m.group(1).replace("\\'", "'")), s)
    s = re.sub(r"([{\[,]\s*)([A-Za-z_$][\w$]*)\s*:", r'\1"\2":', s)
    s = re.sub(r",(\s*[}\]])", r"\1", s)
    try:
        return json.loads(s)
    except ValueError:
        return None


def mine_replay_cases(paths: list[str]) -> tuple[list[dict], int]:
    cases: list[dict] = []
    skipped = 0
    for path in paths:
        try:
            src = open(path).read()
        except OSError:
            continue
        for m in re.finditer(r"_test\(\{", src):
            body = _balanced(src, m.end() - 1, "{", "}")
            if body is None:
                skipped += 1
                continue
            tm = re.search(r"type:\s*'(\w+)'", body)
            if not tm:
                skipped += 1
                continue
            op = tm.group(1)
            # the scope: back to the enclosing it( block
            scope_start = src.rfind("it(", 0, m.start())
            scope = src[scope_start:m.start()]

            def resolve(name: str, _depth=0):
                if _depth > 3:
                    return None
                # nearest decl in the it( scope, else file-wide
                # (shared corpus consts like _json_dir_*)
                for hay in (scope, src):
                    decls = list(re.finditer(
                        rf"const {re.escape(name)} =\s*", hay))
                    if not decls:
                        continue
                    start = decls[-1].end()
                    rest = hay[start:]
                    am = re.match(r"([A-Za-z_$][\w$]*);", rest)
                    if am:  # alias of another const
                        return resolve(am.group(1), _depth + 1)
                    try:
                        val, _ = _DECODER.raw_decode(rest)
                        return val
                    except ValueError:
                        return None
                return None

            im = re.search(r"input:\s*([A-Za-z_$][\w$]*)", body)
            input_name = im.group(1) if im else (
                "input" if re.search(r"(?:\{|,)\s*input\s*[,}]", body)
                else None)
            if input_name is None:
                skipped += 1
                continue
            doc = resolve(input_name)
            if doc is None:
                skipped += 1
                continue

            case: dict = {"op": op, "doc": doc}
            om = re.search(r"options:\s*\{", body)
            if om:
                oblob = _balanced(body, om.end() - 1, "{", "}")
                opts = _js_literal_to_json(oblob) if oblob else None
                if opts is None:
                    skipped += 1
                    continue
                # a ctx variable reference inside options can't be mined
                case["options"] = opts
            cm = re.search(r"ctx:\s*([A-Za-z_$][\w$]*)", body)
            if cm:
                ctx = resolve(cm.group(1))
                if ctx is None:
                    skipped += 1
                    continue
                case["ctx"] = ctx
            fm = re.search(r"frame:\s*([A-Za-z_$][\w$]*)", body)
            if fm:
                frame = resolve(fm.group(1))
                if frame is None:
                    skipped += 1
                    continue
                case["frame"] = frame
            em = re.search(r"eventCodeLog:\s*\[", body)
            if em:
                eblob = _balanced(body, em.end() - 1, "[", "]")
                ev = _js_literal_to_json(eblob) if eblob else None
                if ev is not None and all(isinstance(x, str) for x in ev):
                    case["eventCodeLog"] = ev
            if re.search(r"testSafe:\s*true", body):
                case["testSafe"] = True
            if re.search(r"testNotSafe:\s*true", body):
                case["testNotSafe"] = True
            cases.append(case)
    return cases, skipped
