"""Snapshot the rendered registry surface for the plans/oracles split.

Writes tests/fixtures/registry_snapshot.json capturing EVERYTHING the
r10 verdict's item #2 requires to stay byte-identical across the
plans/registry.py -> plans/oracles/ package refactor:

- the post-demotion QUERIES key order and each builder's __name__,
- the post-demotion ORACLES key order and the sha256 of every rendered
  oracle SQL string,
- the TEACHING map (fn name + sql sha256 per demoted form).

Run once BEFORE the refactor (fixture committed), never regenerated
after; tests/test_oracle_parity.py::test_registry_snapshot_is_byte_identical
asserts the live registry still renders to exactly this surface.
"""

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_visualization_of_cryptocurrency_trading_data_spark.plans import registry  # noqa: E402


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


snap = {
    "queries_order": list(registry.QUERIES),
    "builder_names": {k: fn.__name__ for k, fn in registry.QUERIES.items()},
    "oracles_order": list(registry.ORACLES),
    "oracle_sha256": {k: sha(v) for k, v in registry.ORACLES.items()},
    "teaching": {
        k: [fn.__name__, sha(sql)] for k, (fn, sql) in registry.TEACHING.items()
    },
}

out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"
out.mkdir(exist_ok=True)
(out / "registry_snapshot.json").write_text(json.dumps(snap, indent=1) + "\n")
print(
    f"wrote {out/'registry_snapshot.json'}: "
    f"{len(snap['queries_order'])} queries, {len(snap['oracles_order'])} oracles, "
    f"{len(snap['teaching'])} teaching forms"
)
