"""Checkpoint/resume for large batched solve campaigns.

The reference has no checkpointing (SURVEY §5.4); solves are seconds-long
and single-shot.  At pod scale (65k scenarios, BASELINE.json config 5) a
campaign is minutes-to-hours, so completed work must survive restarts: the
runner processes the scenario set in chunks and persists each finished
chunk (controls + iteration counts + a JSON manifest).  A restarted run
skips finished chunks.

Storage is dependency-free ``.npz`` + manifest; swap `_save_chunk`/
`_load_chunk` for an orbax CheckpointManager when running on multi-host
filesystems.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ipoc_tpu.config import DEFAULT_CONFIG, SolverConfig
from ipoc_tpu.problem import OCP
from ipoc_tpu.solvers.batched import BatchSolution, solve_batch


class CheckpointedBatchRunner:
    """Chunked batched solves with restart-safe persistence."""

    def __init__(self, directory: str, chunk_size: int = 256):
        self.directory = directory
        self.chunk_size = chunk_size
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"chunks_done": []}

    def _check_identity(self, n: int, horizon: int, nu: int,
                        semantics: dict) -> dict:
        """Refuse to resume a run whose chunking/campaign shape OR solver
        semantics changed.

        Chunk files are keyed by index only, so resuming with a different
        ``chunk_size`` or scenario-set shape would silently splice stale
        chunks into the result at the wrong offsets — and resuming the
        same-shaped campaign with a different cfg/method/dtype would
        silently splice chunks solved under different solver settings into
        one result.  The manifest records the campaign identity (shape +
        a digest of cfg, the method, and the dtype) on first run and must
        match on resume (delete the directory to start over)."""
        m = self._manifest()
        ident = {"chunk_size": self.chunk_size, "n": n,
                 "horizon": horizon, "nu": nu, **semantics}
        recorded = m.get("identity")
        if recorded is not None and set(recorded) < set(ident):
            # Manifest written before the identity grew the semantics
            # keys (cfg digest/method/dtype): compare on the recorded
            # keys only and back-fill the new ones, so pre-existing
            # checkpoint directories stay resumable.
            if {k: ident[k] for k in recorded} == recorded:
                recorded = m["identity"] = ident
                tmp = self._manifest_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(m, f)
                os.replace(tmp, self._manifest_path)
        if recorded is None:
            m["identity"] = ident
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.replace(tmp, self._manifest_path)
        elif recorded != ident:
            raise ValueError(
                f"checkpoint directory {self.directory!r} was written by a "
                f"run with {recorded}, resumed with {ident}; finished "
                "chunks would splice at wrong offsets — use a fresh "
                "directory (or delete this one) to change the campaign"
            )
        return m

    def _mark_done(self, idx: int):
        m = self._manifest()
        if idx not in m["chunks_done"]:
            m["chunks_done"].append(idx)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic

    def _chunk_path(self, idx: int) -> str:
        return os.path.join(self.directory, f"chunk_{idx:06d}.npz")

    def _save_chunk(self, idx: int, sol: BatchSolution):
        tmp = self._chunk_path(idx) + ".tmp.npz"
        np.savez(
            tmp,
            controls=np.asarray(sol.controls),
            iterations=np.asarray(sol.iterations),
        )
        os.replace(tmp, self._chunk_path(idx))
        self._mark_done(idx)

    def _load_chunk(self, idx: int) -> BatchSolution:
        data = np.load(self._chunk_path(idx))
        return BatchSolution(
            jnp.asarray(data["controls"]), jnp.asarray(data["iterations"])
        )

    def run(
        self,
        ocp: OCP,
        controls,        # (N, T, nu)
        initial_states,  # (N, nx)
        cfg: SolverConfig = DEFAULT_CONFIG,
        method: str = "par",
        solve_fn=None,
    ) -> BatchSolution:
        """Solve all N scenarios, resuming from any prior partial run.

        ``solve_fn(u_chunk, x_chunk) -> BatchSolution`` may override the
        default vmapped solve (e.g. with a mesh-sharded one).
        """
        import hashlib

        n, horizon, nu = controls.shape
        custom = solve_fn is not None
        if solve_fn is None:
            solve_fn = lambda u, x: solve_batch(ocp, u, x, cfg, method)
        semantics = {
            "cfg_digest": hashlib.sha256(repr(cfg).encode()).hexdigest()[:16],
            "method": "<custom solve_fn>" if custom else method,
            "dtype": str(jnp.result_type(controls)),
        }
        done = set(
            self._check_identity(n, horizon, nu, semantics)["chunks_done"])
        out = []
        for idx, start in enumerate(range(0, n, self.chunk_size)):
            end = min(start + self.chunk_size, n)
            if idx in done:
                out.append(self._load_chunk(idx))
                continue
            sol = solve_fn(controls[start:end], initial_states[start:end])
            sol = BatchSolution(
                jnp.asarray(sol.controls), jnp.asarray(sol.iterations)
            )
            self._save_chunk(idx, sol)
            out.append(sol)
        return BatchSolution(
            jnp.concatenate([s.controls for s in out], axis=0),
            jnp.concatenate([s.iterations for s in out], axis=0),
        )
