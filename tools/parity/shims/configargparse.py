"""Minimal configargparse stand-in for running the reference without pip.

Only the surface the reference uses (`DS_NeRF/run_nerf.py:740-925`,
`mask_refinement.py:17-26`): ``ArgumentParser`` with ``add_argument(...,
is_config_file=True)`` and `key = value` config-file syntax. Values from the
config file are injected as defaults; explicit CLI args win, matching
configargparse precedence.
"""
from __future__ import annotations

import argparse
import shlex


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *args, **kwargs):
        kwargs.pop("default_config_files", None)
        super().__init__(*args, **kwargs)
        self._config_args: list[str] = []

    def add_argument(self, *args, **kwargs):  # noqa: D102
        is_config = kwargs.pop("is_config_file", False)
        action = super().add_argument(*args, **kwargs)
        if is_config:
            self._config_args.append(action.dest)
        return action

    def parse_args(self, args=None, namespace=None):  # noqa: D102
        ns, _ = super().parse_known_args(args=args, namespace=namespace)
        for dest in self._config_args:
            path = getattr(ns, dest, None)
            if not path:
                continue
            defaults = {}
            with open(path) as fh:
                for line in fh:
                    line = line.split("#", 1)[0].strip()
                    if not line or "=" not in line:
                        continue
                    key, val = (s.strip() for s in line.split("=", 1))
                    act = next((a for a in self._actions if a.dest == key),
                               None)
                    if act is None:
                        continue
                    if isinstance(act, (argparse._StoreTrueAction,
                                        argparse._StoreConstAction)):
                        defaults[key] = val.lower() in ("true", "1", "yes")
                    elif act.nargs in ("+", "*"):
                        defaults[key] = [
                            (act.type or str)(v) for v in shlex.split(val)]
                    else:
                        defaults[key] = (act.type or str)(val)
            self.set_defaults(**defaults)
        return super().parse_args(args=args, namespace=namespace)
