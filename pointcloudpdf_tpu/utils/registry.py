"""String-keyed component registry.

The whole framework is wired by registries: configs are plain dicts whose
``type`` key names a registered class/function, mirroring the reference
registry contract (reference: pointcept/utils/registry.py:59, build_from_cfg
pointcept/utils/registry.py:9-56) with a fresh, minimal implementation.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> callable registry with dict-driven construction.

    Example::

        MODELS = Registry("models")

        @MODELS.register_module()
        class PointTransformerSeg50: ...

        model = MODELS.build(dict(type="PointTransformerSeg50", num_classes=13))
    """

    def __init__(self, name: str, parent: Optional["Registry"] = None):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}
        self._parent = parent
        self._children: Dict[str, "Registry"] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Callable]:
        return dict(self._module_dict)

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={sorted(self._module_dict)})"

    def get(self, key: str) -> Optional[Callable]:
        """Look up ``key``, falling back to the parent registry if set."""
        if key in self._module_dict:
            return self._module_dict[key]
        if self._parent is not None:
            return self._parent.get(key)
        return None

    def _register(self, module: Callable, name=None, force: bool = False):
        if not callable(module):
            raise TypeError(f"module must be callable, got {type(module)}")
        names = [module.__name__] if name is None else (
            [name] if isinstance(name, str) else list(name)
        )
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} is already registered in {self._name}")
            self._module_dict[n] = module

    def register_module(self, name=None, module: Callable = None, force: bool = False):
        """Register a class/function, usable as decorator or direct call."""
        if module is not None:
            self._register(module, name=name, force=force)
            return module

        def _decorator(mod):
            self._register(mod, name=name, force=force)
            return mod

        return _decorator

    def build(self, cfg: dict, default_args: Optional[dict] = None) -> Any:
        return build_from_cfg(cfg, self, default_args)


def build_from_cfg(cfg: dict, registry: Registry, default_args: Optional[dict] = None) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg-minus-type, **default_args)``.

    ``cfg['type']`` may also be a callable, which is then used directly.
    """
    if not isinstance(cfg, dict):
        raise TypeError(f"cfg must be a dict, got {type(cfg)}")
    if "type" not in cfg:
        if default_args is None or "type" not in default_args:
            raise KeyError(f'cfg must contain the key "type": {cfg}')
    if not isinstance(registry, Registry):
        raise TypeError(f"registry must be a Registry, got {type(registry)}")

    args = dict(cfg)
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)

    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}")
    elif callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or callable, got {type(obj_type)}")

    try:
        return obj_cls(**args)
    except Exception as e:  # re-raise with context on which component failed
        if inspect.isclass(obj_cls):
            cls_name = obj_cls.__name__
        else:
            cls_name = getattr(obj_cls, "__name__", repr(obj_cls))
        raise type(e)(f"{cls_name}: {e}") from e
