// minifb: a minimal FlatBuffers writer/reader for the fixed PPX schema.
//
// The environment ships no flatbuffers headers, so this implements the
// public FlatBuffers wire format (little-endian, vtables, uoffsets)
// directly — enough for the tables in pyprob_tpu/ppx/ppx.fbs.  Verified
// byte-compatible against the Python flatbuffers runtime by the
// cross-language tests (tests/test_remote_cpp.py).

#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <stdexcept>

namespace minifb {

// ---------------------------------------------------------------------------
// Builder: constructs a buffer back-to-front, like the reference builders.
// Offsets ("uoffset space") are measured from the END of the buffer.
// ---------------------------------------------------------------------------

class Builder {
 public:
  explicit Builder(size_t initial = 1024) : buf_(initial, 0), head_(initial) {}

  size_t offset() const { return buf_.size() - head_; }

  void pad(size_t n) {
    for (size_t i = 0; i < n; i++) push_byte(0);
  }

  void align(size_t n, size_t additional = 0) {
    size_t a = (~(buf_.size() - head_ + additional)) + 1;
    a &= (n - 1);
    pad(a);
  }

  template <typename T>
  void push(T v) {
    align(sizeof(T));
    make_space(sizeof(T));
    head_ -= sizeof(T);
    std::memcpy(&buf_[head_], &v, sizeof(T));
  }

  void push_bytes(const uint8_t* data, size_t n) {
    make_space(n);
    head_ -= n;
    std::memcpy(&buf_[head_], data, n);
  }

  // relative uoffset to a previously written object
  void push_uoffset(size_t off) {
    align(sizeof(uint32_t));
    if (off > offset()) throw std::runtime_error("bad offset");
    uint32_t rel = static_cast<uint32_t>(offset() - off + sizeof(uint32_t));
    make_space(sizeof(uint32_t));
    head_ -= sizeof(uint32_t);
    std::memcpy(&buf_[head_], &rel, sizeof(uint32_t));
  }

  size_t create_string(const std::string& s) {
    // strings are null-terminated byte vectors
    align(sizeof(uint32_t), s.size() + 1);
    push_byte(0);
    push_bytes(reinterpret_cast<const uint8_t*>(s.data()), s.size());
    push<uint32_t>(static_cast<uint32_t>(s.size()));
    return offset();
  }

  template <typename T>
  size_t create_vector(const std::vector<T>& v) {
    align(sizeof(uint32_t), v.size() * sizeof(T));
    align(sizeof(T), v.size() * sizeof(T));
    push_bytes(reinterpret_cast<const uint8_t*>(v.data()), v.size() * sizeof(T));
    push<uint32_t>(static_cast<uint32_t>(v.size()));
    return offset();
  }

  void start_table(int num_slots) {
    slots_.assign(num_slots, 0);
    object_end_ = offset();
  }

  void slot_uoffset(int slot, size_t off) {
    if (off == 0) return;
    push_uoffset(off);
    slots_[slot] = offset();
  }

  void slot_u8(int slot, uint8_t v, uint8_t def) {
    if (v == def) return;
    push<uint8_t>(v);
    slots_[slot] = offset();
  }

  void slot_bool(int slot, bool v, bool def) {
    if (v == def) return;
    push<uint8_t>(v ? 1 : 0);
    slots_[slot] = offset();
  }

  size_t end_table() {
    // placeholder soffset to vtable
    push<int32_t>(0);
    size_t object_offset = offset();
    // trim trailing zero slots
    int n = static_cast<int>(slots_.size());
    while (n > 0 && slots_[n - 1] == 0) n--;
    // write vtable entries back-to-front
    for (int i = n - 1; i >= 0; i--) {
      uint16_t entry =
          slots_[i] == 0
              ? 0
              : static_cast<uint16_t>(object_offset - slots_[i]);
      push<uint16_t>(entry);
    }
    push<uint16_t>(static_cast<uint16_t>(object_offset - object_end_));
    push<uint16_t>(static_cast<uint16_t>((n + 2) * sizeof(uint16_t)));
    // patch the placeholder: soffset32 = vtable_pos relative
    size_t vtable_offset = offset();
    int32_t soffset = static_cast<int32_t>(vtable_offset - object_offset);
    size_t pos = buf_.size() - object_offset;
    std::memcpy(&buf_[pos], &soffset, sizeof(int32_t));
    return object_offset;
  }

  void finish(size_t root, const char ident[4]) {
    align(sizeof(uint32_t), sizeof(uint32_t) + 4);
    push_bytes(reinterpret_cast<const uint8_t*>(ident), 4);
    push_uoffset(root);
  }

  const uint8_t* data() const { return &buf_[head_]; }
  size_t size() const { return buf_.size() - head_; }

 private:
  void push_byte(uint8_t b) {
    make_space(1);
    head_ -= 1;
    buf_[head_] = b;
  }

  void make_space(size_t n) {
    if (head_ >= n) return;
    size_t old_size = buf_.size();
    size_t grow = old_size;
    while (head_ + grow < n) grow *= 2;
    std::vector<uint8_t> nb(old_size + grow, 0);
    std::memcpy(&nb[head_ + grow], &buf_[head_], old_size - head_);
    buf_.swap(nb);
    head_ += grow;
  }

  std::vector<uint8_t> buf_;
  size_t head_;
  std::vector<size_t> slots_;
  size_t object_end_ = 0;
};

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

class Table {
 public:
  Table() : buf_(nullptr), size_(0), pos_(0) {}
  Table(const uint8_t* buf, size_t size, size_t pos)
      : buf_(buf), size_(size), pos_(pos) {}

  bool valid() const { return buf_ != nullptr; }

  static Table root(const uint8_t* buf, size_t size) {
    uint32_t off = read<uint32_t>(buf, 0);
    return Table(buf, size, off);
  }

  // vtable-relative field offset for slot i (0 if absent)
  uint16_t field(int slot) const {
    int32_t soffset = read<int32_t>(buf_, pos_);
    size_t vtable = pos_ - soffset;
    uint16_t vsize = read<uint16_t>(buf_, vtable);
    size_t entry = 4 + 2 * static_cast<size_t>(slot);
    if (entry >= vsize) return 0;
    return read<uint16_t>(buf_, vtable + entry);
  }

  uint8_t get_u8(int slot, uint8_t def = 0) const {
    uint16_t o = field(slot);
    return o ? read<uint8_t>(buf_, pos_ + o) : def;
  }

  bool get_bool(int slot, bool def = false) const {
    uint16_t o = field(slot);
    return o ? read<uint8_t>(buf_, pos_ + o) != 0 : def;
  }

  std::string get_string(int slot) const {
    uint16_t o = field(slot);
    if (!o) return "";
    size_t p = indirect(pos_ + o);
    uint32_t len = read<uint32_t>(buf_, p);
    return std::string(reinterpret_cast<const char*>(buf_ + p + 4), len);
  }

  Table get_table(int slot) const {
    uint16_t o = field(slot);
    if (!o) return Table();
    return Table(buf_, size_, indirect(pos_ + o));
  }

  template <typename T>
  std::vector<T> get_vector(int slot) const {
    uint16_t o = field(slot);
    if (!o) return {};
    size_t p = indirect(pos_ + o);
    uint32_t len = read<uint32_t>(buf_, p);
    std::vector<T> out(len);
    std::memcpy(out.data(), buf_ + p + 4, len * sizeof(T));
    return out;
  }

 private:
  size_t indirect(size_t p) const { return p + read<uint32_t>(buf_, p); }

  template <typename T>
  static T read(const uint8_t* b, size_t p) {
    T v;
    std::memcpy(&v, b + p, sizeof(T));
    return v;
  }

  const uint8_t* buf_;
  size_t size_;
  size_t pos_;
};

}  // namespace minifb
