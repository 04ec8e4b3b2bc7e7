"""Training: optax optimizer + schedules, jitted multi-task train steps,
checkpointing, and the host-side interleaved trainer loop.

Replaces the reference's DeepSpeed ZeRO-2 stack (procyon/training/trainIT.py,
configs/deepspeed/*.json): optimizer state is GSPMD-sharded along the fsdp
mesh axis instead of ZeRO partitions; no CPU offload needed.
"""
