"""Proof (de)serialization.

The reference keeps proofs purely in memory (no serde — SURVEY §5
"checkpoint/resume: none"); persistence is new framework capability, needed
for cross-checking against reference vectors and for shipping proofs between
prover and verifier processes.

Format: a self-describing JSON envelope; field scalars are encoded as the
compressed little-endian hex used by the transcript layer, digests as hex.
"""

from __future__ import annotations

import json
from ..commit.merkle import MerklePath
from ..fri.fri import FriProof
from .stark import StarkProof


def _enc_scalar(field, s) -> str:
    return field.serialize_compressed(s).hex()

def _dec_scalar(field, h: str):
    return field.deserialize_compressed(bytes.fromhex(h))


def _enc_path(ext, p: MerklePath) -> dict:
    return {
        "leaf_neighbours": [_enc_scalar(ext, v) for v in p.leaf_neighbours],
        "path": [[d.hex() for d in level] for level in p.path],
    }

def _dec_path(ext, d: dict) -> MerklePath:
    return MerklePath(
        leaf_neighbours=[_dec_scalar(ext, v) for v in d["leaf_neighbours"]],
        path=[[bytes.fromhex(x) for x in level] for level in d["path"]],
    )


def proof_to_json(stark_field, proof: StarkProof) -> str:
    ext = stark_field.extension
    fri = proof.fri_proof
    if hasattr(fri, "to_host"):
        fri = fri.to_host()
    doc = {
        "version": 1,
        "field": stark_field.name,
        "arthur": proof.arthur.hex(),
        "trace_commit": proof.trace_commit.hex(),
        "constrain_trace_commit": proof.constrain_trace_commit.hex(),
        "constrain_queries": [
            [_enc_scalar(ext, v) for v in q] for q in proof.constrain_queries
        ],
        "validity_queries": [_enc_scalar(ext, v) for v in proof.validity_queries],
        "fri": {
            "points": [
                [[[_enc_scalar(ext, x), _enc_scalar(ext, y)] for (x, y) in triple]
                 for triple in rnd]
                for rnd in fri.points
            ],
            "queries": [
                [[_enc_path(ext, p1), _enc_path(ext, p2)] for (p1, p2) in rnd]
                for rnd in fri.queries
            ],
            "quotients": [
                [[_enc_scalar(ext, c) for c in q] for q in rnd]
                for rnd in fri.quotients
            ],
        },
    }
    return json.dumps(doc)


def proof_from_json(stark_field, data: str) -> StarkProof:
    ext = stark_field.extension
    doc = json.loads(data)
    assert doc["version"] == 1
    assert doc["field"] == stark_field.name, "field mismatch"
    fri = FriProof(
        points=[
            [[tuple([_dec_scalar(ext, x), _dec_scalar(ext, y)]) for x, y in triple]
             for triple in rnd]
            for rnd in doc["fri"]["points"]
        ],
        queries=[
            [[_dec_path(ext, p1), _dec_path(ext, p2)] for p1, p2 in rnd]
            for rnd in doc["fri"]["queries"]
        ],
        quotients=[
            [[_dec_scalar(ext, c) for c in q] for q in rnd]
            for rnd in doc["fri"]["quotients"]
        ],
    )
    return StarkProof(
        arthur=bytes.fromhex(doc["arthur"]),
        trace_commit=bytes.fromhex(doc["trace_commit"]),
        constrain_trace_commit=bytes.fromhex(doc["constrain_trace_commit"]),
        constrain_queries=[
            [_dec_scalar(ext, v) for v in q] for q in doc["constrain_queries"]
        ],
        validity_queries=[_dec_scalar(ext, v) for v in doc["validity_queries"]],
        fri_proof=fri,
    )
