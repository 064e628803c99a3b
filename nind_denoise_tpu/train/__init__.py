# training stack: steps (jitted train/eval steps), dataset (input pipeline),
# loop (nn_train-equivalent CLI). Imported directly to keep costs low.
