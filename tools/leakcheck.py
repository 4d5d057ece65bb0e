"""Public-knowledge leak check (round-12, VERDICT r11 item 5).

The per-round ``LEAKCHECK.json`` was produced by the round driver through
round 10; this tool regenerates it from the repo so the 0-hit claim always
covers the CURRENT tree. Everything in this engine must derive from public
knowledge only (PySpark API, the public reference repo, published papers),
so the scan greps all tracked source for the classes of string that would
indicate otherwise:

- internal-import : imports of cloud/vendor/internal SDKs the engine must
                    not depend on (boto3/awsglue/airflow/botocore — the
                    reference's stack, absent here by design — plus any
                    anthropic/axon-style internal package)
- internal-url    : corp/internal-looking URLs (``*.corp.*``,
                    ``internal.*``, ``go/<shortlink>`` forms)
- internal-pkg2   : internal project/package name patterns
- internal-bucket : concrete cloud resource URIs (s3:// etc.) — citation
                    docstrings naming reference FILES are fine; a real
                    bucket/queue URI would not be
- slack-link      : Slack archive links / internal channel names
- api-key         : credential-shaped strings (AWS key ids, sk-ant-,
                    secret assignment keys)
- axon-env        : AXON_*-style internal environment variables

Usage:  python tools/leakcheck.py [--round N] [--out LEAKCHECK.json]
Exit 0 on 0 hits, 1 otherwise.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS: dict[str, re.Pattern] = {
    "internal-import": re.compile(
        r"^\s*(?:import|from)\s+"
        r"(?:boto3|botocore|awsglue|airflow|awswrangler|anthropic\w*|"
        r"axon\w*)\b"),
    "internal-url": re.compile(
        r"https?://[\w.-]*(?:\.corp\.|internal\.|intranet\.)[\w./-]*"
        r"|\bgo/[a-z][\w-]{2,}\b"),
    "internal-pkg2": re.compile(
        r"claude[-_](?:cli|code)[-_]internal|anthropics/"),
    "internal-bucket": re.compile(
        r"\b(?:s3|s3a|gs|dynamodb|sqs|arn:aws)://[\w./-]+"),
    "slack-link": re.compile(
        r"slack\.com/archives|\B#claude-code-[\w-]+"),
    "api-key": re.compile(
        r"\bAKIA[0-9A-Z]{16}\b|\bsk-ant-[\w-]+"
        r"|aws_secret_access_key\s*="),
    "axon-env": re.compile(r"\bAXON_[A-Z_]+\b"),
}

SCAN_EXT = {".py", ".md", ".toml", ".cfg", ".ini", ".json", ".txt",
            ".yml", ".yaml", ".sh"}
SKIP_DIRS = {".git", "__pycache__", ".scale_probe", "spark-warehouse",
             ".pytest_cache", ".hypothesis"}
#: round artifacts that legitimately DESCRIBE these patterns (this tool,
#: judge/advisor prose, prior leakcheck output) — scanning them would
#: self-flag the detector's own regex text
SKIP_FILES = {"LEAKCHECK.json", "leakcheck.py", "VERDICT.md", "ADVICE.md",
              "SNIPPETS.md", "PAPERS.md"}


def scan() -> dict[str, list[str]]:
    hits: dict[str, list[str]] = {k: [] for k in PATTERNS}
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
        for fname in files:
            if fname in SKIP_FILES or os.path.splitext(fname)[1] not in SCAN_EXT:
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, REPO)
            try:
                with open(path, encoding="utf-8", errors="replace") as fh:
                    for lineno, line in enumerate(fh, 1):
                        for cat, pat in PATTERNS.items():
                            if pat.search(line):
                                hits[cat].append(
                                    f"{rel}:{lineno}: {line.strip()[:160]}")
            except OSError:
                continue
    return hits


def main() -> int:
    rnd, out = None, os.path.join(REPO, "LEAKCHECK.json")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--round" and i + 1 < len(argv):
            rnd = int(argv[i + 1])
        elif a == "--out" and i + 1 < len(argv):
            out = argv[i + 1]
    hits = scan()
    n = sum(len(v) for v in hits.values())
    doc = {"round": rnd, "n_hits": n, "hits": hits}
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"round": rnd, "n_hits": n,
                      **({"hits": hits} if n else {})}))
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
