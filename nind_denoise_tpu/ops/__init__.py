# submodules (conv, losses, rl_deblur, stitch) are imported directly by users
# to keep import costs low and avoid cycles.
