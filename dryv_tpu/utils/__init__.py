"""Support utilities: structured logging, stage timers, profiling hooks,
checkpoint/resume."""
from .obs import StageTimers, logger, enable_debug_log, trace_device
from .ckpt import snapshot_dpb, restore_dpb

__all__ = ["StageTimers", "logger", "enable_debug_log", "trace_device",
           "snapshot_dpb", "restore_dpb"]
