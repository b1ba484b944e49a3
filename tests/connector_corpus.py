"""Extract the reference's live-connector e2e corpus at test time.

Parses ``tests/common/test_cases.rs`` (42 BASE_PREDICATE_PUSHDOWN_TESTS)
and the QUICKWIT_RAW_QUERY_TESTS block of ``tests/quickwit.rs`` straight
out of the reference checkout — nothing is copied into this repo, same
model as tests/test_reference_parity.py. Each case carries:

- ``query``: the KQL to run
- ``expected``: per-connector residual query after the optimizer +
  connector pushdown (Expected::Default / Expected::Override)
- ``results``: expected row count or exact JSON rows
- ``name``

The reference harness (tests/common/predicate_pushdown.rs same_results)
asserts three things per case, which test_connector_cases.py mirrors:
the optimized steps equal the parse of the expected residual, pushdown
results equal no-pushdown results (sorted), and the rows match the
expectation.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

REF_TESTS_DIR = "/root/reference/tests"
TEST_CASES_RS = os.path.join(REF_TESTS_DIR, "common", "test_cases.rs")
QUICKWIT_RS = os.path.join(REF_TESTS_DIR, "quickwit.rs")

CONNECTORS = ("Elastic", "Quickwit", "Splunk")


@dataclass(frozen=True)
class Case:
    name: str
    query: str
    default_expected: str
    overrides: tuple  # ((connector, ...), expected_str), ...
    count: int | None
    logs: tuple | None  # expected row dicts

    def expected_for(self, connector: str) -> str:
        for conns, value in self.overrides:
            if connector in conns:
                return value
        return self.default_expected


def _strings(text: str) -> list[str]:
    """All Rust string literals (raw r#"..."# / r##"..."## or plain
    "...") in source order, unescaped."""
    out = []
    for m in re.finditer(
        r'r(#+)"(.*?)"\1|"((?:[^"\\]|\\.)*)"', text, re.S
    ):
        if m.group(2) is not None:
            out.append(m.group(2))
        else:
            s = m.group(3)
            out.append(
                s.replace('\\"', '"').replace("\\\\", "\\").replace("\\n", "\n")
            )
    return out


def _parse_block(block: str) -> Case:
    name = _strings(re.search(r"name:\s*(.*?),\s*$", block, re.S | re.M).group(0))[0]

    qm = re.search(r"query:\s*(r#+\".*?\"#+|\"(?:[^\"\\]|\\.)*\")", block, re.S)
    query = _strings(qm.group(1))[0]

    em = re.search(
        r"(?:expected:\s*)(expected!|Expected::Default)\s*\((.*?)\)\s*,\s*\n\s*results:",
        block,
        re.S,
    )
    exp_body = em.group(2)
    exp_strings = _strings(exp_body)
    default_expected = exp_strings[0]
    overrides = []
    # override arms: `Conn1 | Conn2 => <string literal>`
    for om in re.finditer(
        r"([A-Za-z| ]+?)=>\s*(r#+\".*?\"#+|\"(?:[^\"\\]|\\.)*\")", exp_body, re.S
    ):
        conns = tuple(c.strip() for c in om.group(1).split("|") if c.strip())
        overrides.append((conns, _strings(om.group(2))[0]))

    count = None
    logs = None
    cm = re.search(r"ExpectedResults::Count\((\d+)\)", block)
    if cm:
        count = int(cm.group(1))
    else:
        lm = re.search(r"ExpectedResults::Logs\(\s*(r#+\".*?\"#+)", block, re.S)
        logs = tuple(json.loads(_strings(lm.group(1))[0]))

    return Case(name, query, default_expected, tuple(overrides), count, logs)


def _extract(src: str, const_name: str) -> list[Case]:
    m = re.search(
        rf"const {const_name}[^=]*=\s*&\[(.*?)\n\];", src, re.S
    )
    body = m.group(1)
    cases = []
    for block in re.split(r"TestCase\s*\{", body)[1:]:
        cases.append(_parse_block(block))
    return cases


def load_base_cases() -> list[Case]:
    with open(TEST_CASES_RS) as f:
        return _extract(f.read(), "BASE_PREDICATE_PUSHDOWN_TESTS")


def load_quickwit_raw_cases() -> list[Case]:
    with open(QUICKWIT_RS) as f:
        return _extract(f.read(), "QUICKWIT_RAW_QUERY_TESTS")


def load_resources() -> dict[str, list[dict]]:
    """The INDEXES doc sets (predicate_pushdown.rs:28): stack and
    stack_mirror share stackoverflow.posts.10.json, hdfs is
    hdfs.logs.10.json."""
    def jsonl(path):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    stack = jsonl(os.path.join(REF_TESTS_DIR, "resources", "stackoverflow.posts.10.json"))
    hdfs = jsonl(os.path.join(REF_TESTS_DIR, "resources", "hdfs.logs.10.json"))
    return {"stack": stack, "stack_mirror": list(stack), "hdfs": hdfs}


#: index → timestamp field, as each connector's test setup configures
#: (quickwit.rs setup(): stack/stack_mirror → creationDate rfc3339,
#: hdfs → timestamp unix seconds)
TIMESTAMP_FIELDS = {
    "stack": "creationDate",
    "stack_mirror": "creationDate",
    "hdfs": "timestamp",
}
