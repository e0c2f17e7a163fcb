// Native PCD codec: fast binary point-cloud file IO.
//
// The reference delegates PCD IO to Open3D's C++ readers
// (output.cpp:45-52, SlamMapInitializer.cpp:57 in /root/reference); this is
// the equivalent native component for the TPU framework's host runtime.
// Exposed with a plain C ABI consumed via ctypes (open3d_slam_tpu/io/native.py).
//
// Build: make -C native   (produces libo3dslam_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Field {
  std::string name;
  int size = 4;
  char type = 'F';
  int count = 1;
};

struct Header {
  std::vector<Field> fields;
  int64_t n_points = 0;
  bool binary = false;
  size_t data_offset = 0;
  size_t point_stride = 0;
};

bool parse_header(const char* data, size_t len, Header* h) {
  size_t pos = 0;
  std::vector<int> sizes, counts;
  std::vector<char> types;
  std::vector<std::string> names;
  while (pos < len) {
    size_t eol = pos;
    while (eol < len && data[eol] != '\n') ++eol;
    std::string line(data + pos, eol - pos);
    pos = eol + 1;
    if (line.empty() || line[0] == '#') continue;
    size_t sp = line.find(' ');
    std::string key = line.substr(0, sp);
    std::string rest = sp == std::string::npos ? "" : line.substr(sp + 1);
    auto split = [&rest]() {
      std::vector<std::string> out;
      size_t p = 0;
      while (p < rest.size()) {
        size_t q = rest.find(' ', p);
        if (q == std::string::npos) q = rest.size();
        if (q > p) out.push_back(rest.substr(p, q - p));
        p = q + 1;
      }
      return out;
    };
    if (key == "FIELDS") {
      names = split();
    } else if (key == "SIZE") {
      for (auto& s : split()) sizes.push_back(atoi(s.c_str()));
    } else if (key == "TYPE") {
      for (auto& s : split()) types.push_back(s[0]);
    } else if (key == "COUNT") {
      for (auto& s : split()) counts.push_back(atoi(s.c_str()));
    } else if (key == "POINTS") {
      h->n_points = atoll(rest.c_str());
    } else if (key == "WIDTH" && h->n_points == 0) {
      h->n_points = atoll(rest.c_str());
    } else if (key == "DATA") {
      h->binary = rest.rfind("binary", 0) == 0 && rest.rfind("binary_comp", 0) != 0;
      h->data_offset = pos;
      break;
    }
  }
  if (names.empty()) return false;
  if (counts.empty()) counts.assign(names.size(), 1);
  if (sizes.empty()) sizes.assign(names.size(), 4);
  if (types.empty()) types.assign(names.size(), 'F');
  h->point_stride = 0;
  for (size_t i = 0; i < names.size(); ++i) {
    Field f;
    f.name = names[i];
    f.size = sizes[i];
    f.type = types[i];
    f.count = counts[i];
    h->fields.push_back(f);
    h->point_stride += (size_t)f.size * f.count;
  }
  return true;
}

int field_offset(const Header& h, const char* name) {
  size_t off = 0;
  for (const auto& f : h.fields) {
    if (f.name == name) return (int)off;
    off += (size_t)f.size * f.count;
  }
  return -1;
}

}  // namespace

extern "C" {

// Reads a binary PCD. Returns n_points (>=0) or -1 on error.
// Allocates *out_xyz (n*3 floats); *out_normals / *out_rgb are allocated only
// when present in the file, else set to nullptr. Free with pcd_free.
int64_t pcd_read(const char* path, float** out_xyz, float** out_normals,
                 float** out_rgb) {
  *out_xyz = nullptr;
  *out_normals = nullptr;
  *out_rgb = nullptr;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t len = (size_t)st.st_size;
  void* map = mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return -1;
  const char* data = (const char*)map;

  Header h;
  int64_t n = -1;
  if (parse_header(data, len, &h) && h.binary &&
      h.data_offset + h.point_stride * (size_t)h.n_points <= len) {
    n = h.n_points;
    int off_x = field_offset(h, "x");
    int off_y = field_offset(h, "y");
    int off_z = field_offset(h, "z");
    int off_nx = field_offset(h, "normal_x");
    int off_ny = field_offset(h, "normal_y");
    int off_nz = field_offset(h, "normal_z");
    int off_rgb = field_offset(h, "rgb");
    if (off_x < 0 || off_y < 0 || off_z < 0) {
      n = -1;
    } else {
      float* xyz = (float*)malloc(sizeof(float) * 3 * (size_t)n);
      float* nrm = (off_nx >= 0 && off_ny >= 0 && off_nz >= 0)
                       ? (float*)malloc(sizeof(float) * 3 * (size_t)n)
                       : nullptr;
      float* rgb = off_rgb >= 0 ? (float*)malloc(sizeof(float) * 3 * (size_t)n)
                                : nullptr;
      const char* base = data + h.data_offset;
      const size_t stride = h.point_stride;
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < n; ++i) {
        const char* rec = base + stride * (size_t)i;
        memcpy(&xyz[3 * i + 0], rec + off_x, 4);
        memcpy(&xyz[3 * i + 1], rec + off_y, 4);
        memcpy(&xyz[3 * i + 2], rec + off_z, 4);
        if (nrm) {
          memcpy(&nrm[3 * i + 0], rec + off_nx, 4);
          memcpy(&nrm[3 * i + 1], rec + off_ny, 4);
          memcpy(&nrm[3 * i + 2], rec + off_nz, 4);
        }
        if (rgb) {
          uint32_t packed;
          memcpy(&packed, rec + off_rgb, 4);
          rgb[3 * i + 0] = ((packed >> 16) & 0xFF) / 255.0f;
          rgb[3 * i + 1] = ((packed >> 8) & 0xFF) / 255.0f;
          rgb[3 * i + 2] = (packed & 0xFF) / 255.0f;
        }
      }
      *out_xyz = xyz;
      *out_normals = nrm;
      *out_rgb = rgb;
    }
  }
  munmap(map, len);
  return n;
}

void pcd_free(float* p) { free(p); }

// Writes a binary PCD with float32 fields. normals/rgb may be nullptr.
// rgb is given as n*3 floats in [0,1]. Returns 0 on success.
int pcd_write(const char* path, const float* xyz, const float* normals,
              const float* rgb, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  std::string fields = "x y z";
  int nf = 3;
  if (normals) {
    fields += " normal_x normal_y normal_z";
    nf += 3;
  }
  if (rgb) {
    fields += " rgb";
    nf += 1;
  }
  auto rep = [nf](const char* s) {
    std::string out;
    for (int i = 0; i < nf; ++i) {
      if (i) out += ' ';
      out += s;
    }
    return out;
  };
  fprintf(f,
          "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
          "FIELDS %s\nSIZE %s\nTYPE %s\nCOUNT %s\nWIDTH %lld\nHEIGHT 1\n"
          "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS %lld\nDATA binary\n",
          fields.c_str(), rep("4").c_str(), rep("F").c_str(), rep("1").c_str(),
          (long long)n, (long long)n);
  std::vector<float> rec(nf);
  std::vector<float> buf;
  buf.reserve((size_t)n * nf);
  for (int64_t i = 0; i < n; ++i) {
    buf.push_back(xyz[3 * i]);
    buf.push_back(xyz[3 * i + 1]);
    buf.push_back(xyz[3 * i + 2]);
    if (normals) {
      buf.push_back(normals[3 * i]);
      buf.push_back(normals[3 * i + 1]);
      buf.push_back(normals[3 * i + 2]);
    }
    if (rgb) {
      uint32_t packed = ((uint32_t)(rgb[3 * i] * 255.0f) << 16) |
                        ((uint32_t)(rgb[3 * i + 1] * 255.0f) << 8) |
                        (uint32_t)(rgb[3 * i + 2] * 255.0f);
      float as_f;
      memcpy(&as_f, &packed, 4);
      buf.push_back(as_f);
    }
  }
  size_t written = fwrite(buf.data(), sizeof(float), buf.size(), f);
  fclose(f);
  return written == buf.size() ? 0 : -1;
}

}  // extern "C"
