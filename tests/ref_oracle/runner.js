// Differential-oracle runner: executes the REAL reference
// (/root/reference/lib, external deps satisfied by the minimal local
// stubs in ./node_modules) over JSON requests on stdin, one per line:
//   {"op": "expand"|"toRDF"|"flatten"|"compact"|"frame"|"fromRDF",
//    "doc": ..., "ctx": ..., "frame": ..., "options": {...}}
// and prints one JSON line per request: {"ok": true, "result": ...}
// or {"ok": false, "code": ..., "message": ...}.
// invoke with NODE_PATH=<this dir>/node_modules so the reference's own
// requires resolve against the local stubs
const jsonld = require('/root/reference/lib/index.js');
const readline = require('readline');

const rl = readline.createInterface({input: process.stdin, terminal: false});
let queue = Promise.resolve();
rl.on('line', line => {
  if (!line.trim()) return;
  queue = queue.then(async () => {
    let req;
    try { req = JSON.parse(line); } catch (e) {
      console.log(JSON.stringify({ok: false, code: 'bad request', message: String(e)}));
      return;
    }
    try {
      const opts = req.options || {};
      const events = [];
      if (req.collectEvents) {
        opts.eventHandler = ({event}) => { events.push({code: event.code, level: event.level}); };
      }
      let result;
      switch (req.op) {
        case 'expand': result = await jsonld.expand(req.doc, opts); break;
        case 'toRDF':
          result = await jsonld.toRDF(req.doc, {format: 'application/n-quads', ...opts});
          break;
        case 'flatten': result = await jsonld.flatten(req.doc, req.ctx || null, opts); break;
        case 'compact': result = await jsonld.compact(req.doc, req.ctx, opts); break;
        case 'frame': result = await jsonld.frame(req.doc, req.frame, opts); break;
        case 'fromRDF': result = await jsonld.fromRDF(req.dataset, opts); break;
        case 'merge': result = await jsonld.merge(req.docs, req.ctx || null, opts); break;
        default: throw new Error('unknown op ' + req.op);
      }
      console.log(JSON.stringify(req.collectEvents ?
        {ok: true, result, events} : {ok: true, result}));
    } catch (e) {
      console.log(JSON.stringify({
        ok: false,
        code: (e.details && e.details.code) || e.code || e.name || 'Error',
        message: e.message || String(e)}));
    }
  });
});
rl.on('close', () => { queue.then(() => process.exit(0)); });
