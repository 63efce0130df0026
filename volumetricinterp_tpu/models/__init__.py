"""Pluggable basis-model registry.

Mirrors the reference's dynamic-import plugin mechanism
(interpolate.py:61-62, estimate.py:49-50): a model module must provide a
``Model`` class constructible from a config file object (or Config), with
``basis`` / ``grad_basis`` methods taking geodetic coordinates, an ``nbasis``
attribute and an ``eval_reg_matricies`` dict (contract stated at
models/sphharmlag.py:11-15 of the reference).
"""

import importlib


def get_model_module(name: str):
    return importlib.import_module("." + name, package="volumetricinterp_tpu.models")


def make_model(name: str, config):
    return get_model_module(name).Model(config)
