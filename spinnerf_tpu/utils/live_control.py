"""Live training control: the race-free replacement for the reference's
tkinter GUI thread, which mutates `args` concurrently with the train loop
(`DS_NeRF/run_nerf.py:928-960,1151-1153` — an intentional data race).

Here the loop polls a JSON control file between steps — same live knobs
(feat_weight, i_video, render_factor, white_bkgd, ...), no threads, no races,
and it works over SSH where a GUI cannot:

    echo '{"render_factor": 4, "i_video": 2000}' > <expdir>/control.json
"""
from __future__ import annotations

import json
import os
from pathlib import Path

MUTABLE_KEYS = {"feat_weight", "i_video", "i_testset", "i_weights", "i_print",
                "render_factor", "white_bkgd", "i_feat"}


class LiveControl:
    def __init__(self, cfg, path=None, *, mutable=MUTABLE_KEYS, log=print):
        self.cfg = cfg
        self.path = Path(path) if path else cfg.exp_dir() / "control.json"
        self.mutable = set(mutable)
        self.log = log
        self._mtime = None

    def poll(self):
        """Apply pending control-file changes; returns the dict applied."""
        try:
            mtime = os.stat(self.path).st_mtime
        except FileNotFoundError:
            return {}
        if mtime == self._mtime:
            return {}
        self._mtime = mtime
        try:
            data = json.loads(self.path.read_text())
        except (json.JSONDecodeError, OSError) as e:
            self.log(f"[control] ignoring unreadable control file: {e}")
            return {}
        applied = {}
        for k, v in data.items():
            if k not in self.mutable:
                self.log(f"[control] key not mutable: {k}")
                continue
            cur = getattr(self.cfg, k, None)
            if cur is not None and type(cur) is not type(v):
                try:
                    v = type(cur)(v)
                except (TypeError, ValueError):
                    self.log(f"[control] bad value for {k}: {v!r}")
                    continue
            setattr(self.cfg, k, v)
            applied[k] = v
        if applied:
            self.log(f"[control] applied {applied}")
        return applied
