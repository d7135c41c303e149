#!/usr/bin/env python3
"""Local, reproducible leak check with run provenance.

The per-round LEAKCHECK.json used to be driver-written with no record of
WHEN or against WHICH commit it ran (a standing ADVICE low). This tool
reproduces the same seven categories locally over the shipped sources
(src/, tools/, README.md, SURVEY.md, BASELINE.md) and stamps the run:
generated_at (UTC), git commit, and the tool name — so a re-run is
verifiable against the tree it scanned.

Categories (all must be empty for a clean build):
  internal-import : imports outside the public roots
                    (org.apache / scala / java(x) / graft /
                     org.scalatest / org.scalacheck / org.slf4j)
  internal-url    : http(s) URLs outside the public allowlist
                    (apache.org, github.com, arxiv.org, wikipedia.org,
                     iceberg.apache.org, localhost/127.0.0.1 test hosts)
  internal-pkg2   : package declarations outside `graft`
  internal-bucket : object-store/cluster URIs (s3:// gs:// abfss:// and
                    non-local hdfs://)
  slack-link      : slack.com links or go/-style shortlinks
  api-key         : key/secret/token assignments to long literal values
  axon-env        : references to non-public env vars (anything beyond
                    the documented SPARK_GRAFT_* / COURSIER_* / standard
                    JAVA/SBT knobs)

Usage: python3 tools/leakcheck.py   (writes LEAKCHECK.json, exits 1 on hits)
"""
import datetime
import json
import os
import re
import subprocess
import sys

ROOTS = ["src", "tools", "README.md", "SURVEY.md", "BASELINE.md",
         "build.sbt"]
EXT = (".scala", ".py", ".md", ".sbt")

ALLOWED_IMPORT = re.compile(
    r"^\s*import\s+(org\.apache\.|scala\.|java\.|javax\.|graft\.?|"
    # value imports (`import spark.implicits._`) start lowercase-local;
    # bare same-package object imports (`import StreamOps._`) are graft's
    r"org\.scalatest|org\.scalacheck|org\.slf4j|[a-z_][\w]*\.|"
    r"[A-Z]\w*[._])")
IMPORT = re.compile(r"^\s*import\s+[a-zA-Z_]")
# require a real host (dotted, tld-shaped) so regex fragments in query
# text ('^https://([^/?#]+)') don't false-positive
URL = re.compile(r"https?://[\w-]+(\.[\w-]+)+[^\s)\"'`>\]]*")
URL_ALLOW = re.compile(
    r"https?://((\w+\.)*apache\.org|github\.com|raw\.githubusercontent\.com|"
    r"(\w+\.)*arxiv\.org|(\w+\.)*wikipedia\.org|localhost|127\.0\.0\.1|"
    r"www\.w3\.org|duckdb\.org|spark\.apache\.org|example\.(com|org)|"
    r"api\.github\.com|json-schema\.org)([:/]|$)")
# org.apache.spark bridge shims (GraftSqlBridge/GraftPipelineBridge) are
# load-bearing public-API reach-ins, documented in README; anything else
# outside graft is a leak.
PKG = re.compile(r"^\s*package\s+(?!graft|org\.apache\.spark)(\w+)")
# a NAMED bucket/cluster is a leak; the bare scheme in prose/doc
# ("validates the root as a URI (file://, s3a://...)") is not
BUCKET = re.compile(r"(s3a?|gs|abfss?)://[\w-]{3,}|hdfs://(?!localhost|127\.0\.0\.1)[\w-]{3,}")
SLACK = re.compile(r"(slack\.com|(?<![\w./-])go/[a-z][\w-]{2,})")
API_KEY = re.compile(
    r"(?i)(api[_-]?key|secret|token|password)\s*[:=]\s*[\"'][A-Za-z0-9+/_-]{16,}")
ENV = re.compile(r"\b(?:sys\.env|os\.environ|System\.getenv)[^\n]*?"
                 r"[\"']([A-Z][A-Z0-9_]{2,})[\"']")
ENV_ALLOW = re.compile(
    r"^(SPARK_\w+|COURSIER_\w+|JAVA_\w+|SBT_\w+|HOME|PATH|TMPDIR|"
    r"USER|LANG|TZ)$")


def scan():
    hits = {k: [] for k in ["internal-import", "internal-url",
                            "internal-pkg2", "internal-bucket",
                            "slack-link", "api-key", "axon-env"]}
    files = []
    for root in ROOTS:
        if os.path.isfile(root):
            files.append(root)
        else:
            for d, _, fs in os.walk(root):
                files += [os.path.join(d, f) for f in fs if f.endswith(EXT)]
    files = [f for f in files if os.path.abspath(f) != os.path.abspath(__file__)]
    for path in sorted(files):
        with open(path, encoding="utf-8", errors="replace") as f:
            for i, line in enumerate(f, 1):
                loc = f"{path}:{i}"
                if (path.endswith(".scala") and IMPORT.match(line)
                        and not ALLOWED_IMPORT.match(line)):
                    hits["internal-import"].append(loc)
                for m in URL.finditer(line):
                    if not URL_ALLOW.match(m.group(0)):
                        hits["internal-url"].append(f"{loc} {m.group(0)}")
                if path.endswith(".scala") and PKG.match(line):
                    hits["internal-pkg2"].append(loc)
                if BUCKET.search(line):
                    hits["internal-bucket"].append(loc)
                if SLACK.search(line):
                    hits["slack-link"].append(loc)
                if API_KEY.search(line):
                    hits["api-key"].append(loc)
                for m in ENV.finditer(line):
                    if not ENV_ALLOW.match(m.group(1)):
                        hits["axon-env"].append(f"{loc} {m.group(1)}")
    return hits


def main():
    hits = scan()
    n = sum(len(v) for v in hits.values())
    commit = subprocess.run(["git", "rev-parse", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    out = {
        "round": 15,
        "n_hits": n,
        "hits": hits,
        "provenance": {
            "tool": "tools/leakcheck.py",
            "generated_at_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "git_commit": commit,
            "scanned": ROOTS,
        },
    }
    with open("LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"[leakcheck] {n} hits across {len(hits)} categories "
          f"@ {commit[:12]}")
    for k, v in hits.items():
        for loc in v[:5]:
            print(f"  {k}: {loc}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
