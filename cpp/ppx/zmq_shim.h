// Thin declarations for the stable libzmq C ABI (linked against the
// system libzmq.so.5; the image ships the runtime but no headers).
// Only the small REQ/REP surface the PPX protocol needs.

#pragma once

#include <cstddef>

extern "C" {

typedef struct zmq_msg_t {
  unsigned char _[64];  // opaque, 64 bytes in the stable ABI
} zmq_msg_t;

void* zmq_ctx_new(void);
int zmq_ctx_term(void* context);
void* zmq_socket(void* context, int type);
int zmq_close(void* socket);
int zmq_bind(void* socket, const char* endpoint);
int zmq_connect(void* socket, const char* endpoint);
int zmq_send(void* socket, const void* buf, size_t len, int flags);
int zmq_setsockopt(void* socket, int option, const void* optval,
                   size_t optvallen);
int zmq_msg_init(zmq_msg_t* msg);
int zmq_msg_close(zmq_msg_t* msg);
int zmq_msg_recv(zmq_msg_t* msg, void* socket, int flags);
void* zmq_msg_data(zmq_msg_t* msg);
size_t zmq_msg_size(zmq_msg_t* msg);
int zmq_errno(void);
const char* zmq_strerror(int errnum);

}  // extern "C"

#define ZMQ_REQ 3
#define ZMQ_REP 4
#define ZMQ_LINGER 17
