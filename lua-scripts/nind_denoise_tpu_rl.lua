--[[
  nind-denoise-tpu RL — darktable export storage plugin.

  Fresh implementation with the capabilities of the reference plugin
  (/root/reference/src/lua-scripts/nind_denoise_rl.lua): registers an export
  storage that pipes each exported image through the nind-denoise-tpu
  pipeline (CNN denoise + on-device Richardson-Lucy deblur) and writes the
  result to a configurable output path pattern.

  Widgets: output path pattern (all 42 darktable placeholders of the
  reference, nind_denoise_rl.lua:112-116 — $(ROLL_NAME) .. $(EXIF_CROP)),
  output folder fallback, output format (jpg/tif), JPEG quality, RL sigma
  and iterations, deblur toggle, CLI path, optional exiftool EXIF copy
  (reference :452-462).

  Install: place in the darktable lua scripts directory and require it from
  luarc, e.g.  require "nind_denoise_tpu_rl"
]]

local dt = require "darktable"
local df = require "lib/dtutils.file"
local du = require "lib/dtutils"

local MODULE = "nind_denoise_tpu_rl"
local PS = dt.configuration.running_os == "windows" and "\\" or "/"

dt.configuration.check_version(..., { 7, 0, 0 }, { 8, 0, 0 }, { 9, 0, 0 })

-- ---------------------------------------------------------------- settings

local function pref(name, default)
  local v = dt.preferences.read(MODULE, name, "string")
  if v == nil or v == "" then return default end
  return v
end

local HOME = os.getenv("HOME") or "."
local PICTURES = HOME .. PS .. "Pictures"
local DESKTOP = HOME .. PS .. "Desktop"
local USER = os.getenv("USER") or os.getenv("USERNAME") or ""

-- ------------------------------------------------- output path substitution
-- The full placeholder vocabulary of the reference plugin
-- (nind_denoise_rl.lua:111-116, replacements :247-304).

local PLACEHOLDERS = {
  "ROLL_NAME", "FILE_FOLDER", "FILE_NAME", "FILE_EXTENSION", "ID", "VERSION",
  "SEQUENCE", "YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND",
  "EXIF_YEAR", "EXIF_MONTH", "EXIF_DAY", "EXIF_HOUR", "EXIF_MINUTE",
  "EXIF_SECOND", "STARS", "LABELS", "MAKER", "MODEL", "TITLE", "CREATOR",
  "PUBLISHER", "RIGHTS", "USERNAME", "PICTURES_FOLDER", "HOME", "DESKTOP",
  "EXIF_ISO", "EXIF_EXPOSURE", "EXIF_EXPOSURE_BIAS", "EXIF_APERTURE",
  "EXIF_FOCUS_DISTANCE", "EXIF_FOCAL_LENGTH", "LONGITUDE", "LATITUDE",
  "ELEVATION", "LENS", "DESCRIPTION", "EXIF_CROP",
}

local function color_labels(image)
  local labels = {}
  for _, c in ipairs({ "red", "yellow", "green", "blue", "purple" }) do
    if image[c] then table.insert(labels, c) end
  end
  return table.concat(labels, ",")
end

local function substitution_map(image, sequence)
  local now = os.date("*t")
  local ey, emo, ed, eh, emi, es = string.match(
    image.exif_datetime_taken or "",
    "(%d-):(%d-):(%d-) (%d-):(%d-):(%d-)$")
  local values = {
    image.film, image.path, df.get_filename(image.filename),
    string.upper(df.get_filetype(image.filename)), image.id,
    image.duplicate_index, string.format("%04d", sequence),
    now.year, string.format("%02d", now.month),
    string.format("%02d", now.day), string.format("%02d", now.hour),
    string.format("%02d", now.min), string.format("%02d", now.sec),
    ey, emo, ed, eh, emi, es,
    image.rating, color_labels(image), image.exif_maker, image.exif_model,
    image.title, image.creator, image.publisher, image.rights,
    USER, PICTURES, HOME, DESKTOP,
    image.exif_iso, image.exif_exposure, image.exif_exposure_bias,
    image.exif_aperture, image.exif_focus_distance, image.exif_focal_length,
    image.longitude, image.latitude, image.elevation, image.exif_lens,
    image.description, image.exif_crop,
  }
  local map = {}
  for i, name in ipairs(PLACEHOLDERS) do
    map[name] = values[i]
  end
  return map
end

-- Replace every $(VAR) in str; returns nil on an unknown variable.
local function substitute(str, map)
  for token in string.gmatch(str, "%$%(.-%)") do
    local var = string.match(token, "%$%((.-)%)")
    if map[var] == nil then
      dt.print_error(MODULE .. ": unrecognized variable $(" .. var .. ")")
      return nil
    end
    str = string.gsub(str, "%$%(" .. var .. "%)", tostring(map[var]))
  end
  return str
end

-- ---------------------------------------------------------------- widgets

local placeholder_tooltip = "output path pattern; variables:\n"
for _, name in ipairs(PLACEHOLDERS) do
  placeholder_tooltip = placeholder_tooltip .. "$(" .. name .. ")  "
end

local widgets = {
  cli_path = dt.new_widget("entry") {
    text = pref("cli_path", "nind-denoise"),
    tooltip = "path to the nind-denoise CLI (pipeline entry point)",
  },
  exiftool_path = dt.new_widget("entry") {
    text = pref("exiftool_path", "exiftool"),
    tooltip = "path to exiftool for EXIF transplant (empty to skip)",
  },
  output_path = dt.new_widget("entry") {
    text = pref("output_path",
                "$(FILE_FOLDER)/darktable_exported/$(FILE_NAME)"),
    tooltip = placeholder_tooltip,
  },
  output_folder = dt.new_widget("file_chooser_button") {
    title = "output folder (used when the pattern above is empty)",
    is_directory = true,
    value = pref("output_folder", HOME),
  },
  output_format = dt.new_widget("combobox") {
    label = "output format",
    value = 1, "jpg", "tif",
  },
  quality = dt.new_widget("slider") {
    label = "JPEG quality",
    soft_min = 70, soft_max = 100, hard_min = 1, hard_max = 100,
    value = tonumber(pref("quality", "97")),
  },
  sigma = dt.new_widget("slider") {
    label = "RL sigma",
    soft_min = 0, soft_max = 3, hard_min = 0, hard_max = 10,
    value = tonumber(pref("sigma", "1")),
  },
  iterations = dt.new_widget("slider") {
    label = "RL iterations",
    soft_min = 0, soft_max = 30, hard_min = 0, hard_max = 100,
    value = tonumber(pref("iterations", "10")),
  },
  no_deblur = dt.new_widget("check_button") {
    label = "skip RL deblur",
    value = false,
  },
}

local storage_widget = dt.new_widget("box") {
  orientation = "vertical",
  widgets.cli_path,
  widgets.exiftool_path,
  widgets.output_path,
  widgets.output_folder,
  widgets.output_format,
  widgets.quality,
  widgets.sigma,
  widgets.iterations,
  widgets.no_deblur,
}

local function save_prefs()
  dt.preferences.write(MODULE, "cli_path", "string", widgets.cli_path.text)
  dt.preferences.write(MODULE, "exiftool_path", "string",
                       widgets.exiftool_path.text)
  dt.preferences.write(MODULE, "output_path", "string",
                       widgets.output_path.text)
  dt.preferences.write(MODULE, "output_folder", "string",
                       widgets.output_folder.value)
  dt.preferences.write(MODULE, "quality", "string",
                       tostring(widgets.quality.value))
  dt.preferences.write(MODULE, "sigma", "string",
                       tostring(widgets.sigma.value))
  dt.preferences.write(MODULE, "iterations", "string",
                       tostring(widgets.iterations.value))
end

-- ------------------------------------------------------------------ store

local function resolve_output(image, temp_name, img_num, ext)
  local pattern = widgets.output_path.text
  if pattern == nil or pattern == "" then
    return widgets.output_folder.value .. PS
        .. df.get_basename(temp_name) .. "." .. ext
  end
  local resolved = substitute(pattern, substitution_map(image, img_num))
  if resolved == nil then return nil end
  return df.get_path(resolved) .. df.get_basename(resolved) .. "." .. ext
end

local function store(storage, image, img_format, temp_name, img_num, total,
                     hq, extra)
  save_prefs()
  if img_format.extension ~= "tif" and img_format.extension ~= "tiff" then
    dt.print("nind-denoise-tpu: please export as TIFF (32-bit recommended)")
    os.remove(temp_name)
    return false
  end

  local ext = widgets.output_format.value
  local new_name = resolve_output(image, temp_name, img_num, ext)
  if new_name == nil then
    dt.print("nind-denoise-tpu: unknown variable in output pattern, aborting")
    os.remove(temp_name)
    return false
  end

  -- denoise (+ on-device RL deblur) in one in-process CLI run.
  -- -o is an output DIRECTORY (docopt parity with the reference denoise.py);
  -- the CLI writes <basename>.<ext> there (collision-suffixed, but darktable
  -- temp basenames are unique per export).
  -- separate output dir so an ext=tif result can never collide with the
  -- input temp file (the CLI would collision-suffix it unpredictably)
  local work_dir = df.get_path(temp_name) .. "ndtpu_out" .. PS
  df.mkdir(df.sanitize_filename(work_dir))
  local denoised = work_dir .. df.get_basename(temp_name) .. "." .. ext
  local cmd = string.format(
    '%s %s --tiff-input -o %s -e %s -q %d --sigma %d --iterations %d%s',
    widgets.cli_path.text,
    df.sanitize_filename(temp_name),
    df.sanitize_filename(work_dir),
    ext,
    math.floor(widgets.quality.value),
    math.floor(widgets.sigma.value),
    math.floor(widgets.iterations.value),
    widgets.no_deblur.value and " --no_deblur" or "")

  dt.print_log(MODULE .. ": " .. cmd)
  dt.print(string.format("nind-denoise-tpu: processing %d/%d ...",
                         img_num, total))
  local result = du.execute(cmd)
  if result ~= 0 then
    os.remove(temp_name)
    dt.print("nind-denoise-tpu: processing FAILED for " .. image.filename)
    return false
  end

  -- EXIF transplant from the darktable export (reference :452-462)
  if widgets.exiftool_path.text ~= "" then
    local exif_cmd = widgets.exiftool_path.text
        .. " -writeMode cg -TagsFromFile " .. df.sanitize_filename(temp_name)
        .. " -all:all -overwrite_original " .. df.sanitize_filename(denoised)
    dt.print_log(MODULE .. ": " .. exif_cmd)
    if du.execute(exif_cmd) ~= 0 then
      dt.print("nind-denoise-tpu: EXIF copy failed (continuing)")
    end
  end
  os.remove(temp_name)

  -- move to the final destination, never overwriting
  df.mkdir(df.sanitize_filename(df.get_path(new_name)))
  new_name = df.create_unique_filename(new_name)
  df.file_move(denoised, new_name)
  dt.print(string.format("nind-denoise-tpu: finished %d/%d -> %s",
                         img_num, total, new_name))
  return true
end

local function supported(storage, img_format)
  return img_format.extension == "tif" or img_format.extension == "tiff"
end

dt.register_storage(MODULE, "nind-denoise-tpu RL", store, nil, supported,
                    nil, storage_widget)
