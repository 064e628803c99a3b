from . import utilities, json_saver, conf, log
