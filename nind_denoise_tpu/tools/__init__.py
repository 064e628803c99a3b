# offline dataset-construction tools (download, crop, validation-set picking)
